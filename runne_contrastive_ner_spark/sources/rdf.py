"""N-Triples export/scan — the KG interchange surface.

A knowledge graph that can't leave the warehouse isn't one: this module
writes the materialized triple table as W3C N-Triples lines (one triple
per line, `<subj IRI> <pred IRI> <obj IRI> .`) so any RDF store can load
the graph, and reads such files back into the engine's (subj, pred, obj)
shape. Distributed text write/scan — one line per row, no driver-side
formatting.

IRI scheme: entity ids map to ``urn:kg:ent:<url-encoded id>`` and
predicates to ``urn:kg:pred:<url-encoded name>`` — percent-encoding (the
builtin ``url_encode``, JVM-side) makes arbitrary surface-form ids IRI-safe
and the mapping reversible (``url_decode`` on scan). Provenance columns
(conv_id, src_turn_idx) are intentionally NOT serialized — N-Triples has no
per-triple metadata; provenance lives in the parquet/Iceberg table, and the
export is the deduplicated (subj, pred, obj) view.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ENT_NS = "urn:kg:ent:"
PRED_NS = "urn:kg:pred:"


def write_ntriples(triples: DataFrame, path: str) -> None:
    """Write distinct (subj, pred, obj) as N-Triples text at ``path``."""
    line = F.concat(
        F.lit(f"<{ENT_NS}"),
        F.expr("url_encode(CAST(subj AS STRING))"),
        F.lit(f"> <{PRED_NS}"),
        F.expr("url_encode(CAST(pred AS STRING))"),
        F.lit(f"> <{ENT_NS}"),
        F.expr("url_encode(CAST(obj AS STRING))"),
        F.lit("> ."),
    )
    (
        triples.select("subj", "pred", "obj")
        .distinct()
        .select(line.alias("value"))
        .write.mode("overwrite")
        .text(path)
    )


def read_ntriples(spark: SparkSession, path: str) -> DataFrame:
    """Scan N-Triples produced by ``write_ntriples`` (or any file using the
    same namespaces) back to (subj, pred, obj). Lines that don't match the
    three-IRI shape (comments, blank lines) are dropped."""
    pat = (
        rf"^<{ENT_NS}([^>]*)>\s+<{PRED_NS}([^>]*)>\s+<{ENT_NS}([^>]*)>\s+\.$"
    )
    raw = spark.read.text(path)
    return (
        raw.select(
            F.regexp_extract("value", pat, 1).alias("s_enc"),
            F.regexp_extract("value", pat, 2).alias("p_enc"),
            F.regexp_extract("value", pat, 3).alias("o_enc"),
        )
        .filter((F.col("s_enc") != "") & (F.col("p_enc") != "") & (F.col("o_enc") != ""))
        .select(
            F.expr("url_decode(s_enc)").alias("subj"),
            F.expr("url_decode(p_enc)").alias("pred"),
            F.expr("url_decode(o_enc)").alias("obj"),
        )
    )
