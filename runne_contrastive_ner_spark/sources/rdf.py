"""N-Triples export/scan — the KG interchange surface.

A knowledge graph that can't leave the warehouse isn't one: this module
writes the materialized triple table as W3C N-Triples lines (one triple
per line, `<subj IRI> <pred IRI> <obj> .`) so any RDF store can load the
graph, and reads such files back into the engine's (subj, pred, obj)
shape. Distributed text write/scan — one line per row, no driver-side
formatting.

IRI scheme: entity ids map to ``urn:kg:ent:<url-encoded id>`` and
predicates to ``urn:kg:pred:<url-encoded name>`` — percent-encoding (the
builtin ``url_encode``, JVM-side) makes arbitrary surface-form ids IRI-safe
and the mapping reversible (``url_decode`` on scan).

Objects come in two shapes (VERDICT r5 item 7): entity IRIs (the relation
triples the pipeline materializes) and TYPED LITERALS (attribute-style
triples — lifespans, analytics scores — as ``"42"^^xsd:long`` /
``"0.5"^^xsd:double`` / plain ``"..."`` strings with N-Triples
backslash-escaping). A DataFrame with an ``obj_kind`` column
(iri | string | long | double) serializes per row; without one, every
object is an IRI (the original contract). ``attribute_triples`` builds the
literal shape from any per-entity attribute table, typing each column from
its Spark type.

Provenance columns (conv_id, src_turn_idx) are intentionally NOT
serialized — N-Triples has no per-triple metadata; provenance lives in the
parquet/Iceberg table, and the export is the deduplicated (subj, pred,
obj) view.
"""

from __future__ import annotations

import functools

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

ENT_NS = "urn:kg:ent:"
PRED_NS = "urn:kg:pred:"
XSD_NS = "http://www.w3.org/2001/XMLSchema#"

_XSD_OF_SPARK = {
    T.ByteType: "long", T.ShortType: "long", T.IntegerType: "long",
    T.LongType: "long",
    T.FloatType: "double", T.DoubleType: "double",
}


def _escape_literal(col: Column) -> Column:
    """N-Triples string-literal escaping (JVM-side): backslash first, then
    quote, newline, CR, tab — the five characters the grammar forbids raw."""
    out = F.regexp_replace(col, r"\\", r"\\\\")
    out = F.regexp_replace(out, '"', '\\\\"')
    out = F.regexp_replace(out, "\n", r"\\n")
    out = F.regexp_replace(out, "\r", r"\\r")
    return F.regexp_replace(out, "\t", r"\\t")


def _unescape_literal(col: Column) -> Column:
    """Inverse of ``_escape_literal``. Escaped backslashes are swapped to a
    NUL sentinel FIRST so the shorter escapes can't bite into them (the
    lexical form ``\\\\n`` — escaped backslash + letter n — must decode to
    ``\\n`` the two characters, not a newline); raw NUL inside a literal is
    the one input this would corrupt, and the writer never emits one."""
    out = F.regexp_replace(col, r"\\\\", "\x00")
    out = F.regexp_replace(out, r"\\t", "\t")
    out = F.regexp_replace(out, r"\\r", "\r")
    out = F.regexp_replace(out, r"\\n", "\n")
    out = F.regexp_replace(out, r'\\"', '"')
    return F.regexp_replace(out, "\x00", r"\\")


def _obj_term(kind_col: Column, obj_str: Column) -> Column:
    """Serialize one object term by kind: IRI, typed literal, or plain
    string literal (xsd:string is the implied type per the spec)."""
    iri = F.concat(
        F.lit(f"<{ENT_NS}"), F.expr("url_encode(CAST(obj AS STRING))"),
        F.lit(">"),
    )
    quoted = F.concat(F.lit('"'), _escape_literal(obj_str), F.lit('"'))
    typed = F.concat(
        quoted, F.lit(f"^^<{XSD_NS}"), kind_col, F.lit(">")
    )
    return (
        F.when(kind_col == "iri", iri)
        .when(kind_col == "string", quoted)
        .otherwise(typed)
    )


def ntriples_lines(triples: DataFrame) -> DataFrame:
    """The serialized line set ``write_ntriples`` writes — exposed so the
    plan audit can explain the export's physical shape (one distinct
    Exchange + a codegen'd projection; no Python stage)."""
    has_kinds = "obj_kind" in triples.columns
    kind = F.col("obj_kind") if has_kinds else F.lit("iri")
    cols = ["subj", "pred", "obj"] + (["obj_kind"] if has_kinds else [])
    line = F.concat(
        F.lit(f"<{ENT_NS}"),
        F.expr("url_encode(CAST(subj AS STRING))"),
        F.lit(f"> <{PRED_NS}"),
        F.expr("url_encode(CAST(pred AS STRING))"),
        F.lit("> "),
        _obj_term(kind, F.col("obj").cast("string")),
        F.lit(" ."),
    )
    return triples.select(*cols).distinct().select(line.alias("value"))


def write_ntriples(triples: DataFrame, path: str) -> None:
    """Write distinct (subj, pred, obj[, obj_kind]) as N-Triples text at
    ``path``. Without an ``obj_kind`` column every object is an entity IRI;
    with one, each row serializes as IRI / string / long / double."""
    ntriples_lines(triples).write.mode("overwrite").text(path)


def read_ntriples(spark: SparkSession, path: str) -> DataFrame:
    """Scan N-Triples produced by ``write_ntriples`` (or any file using the
    same namespaces) back to (subj, pred, obj, obj_kind) — ``obj`` is the
    decoded id for IRI objects and the unescaped lexical form for literals,
    ``obj_kind`` one of iri | string | long | double. Lines that match
    neither shape (comments, blank lines) are dropped."""
    spo = rf"^<{ENT_NS}([^>]*)>\s+<{PRED_NS}([^>]*)>\s+"
    iri_pat = spo + rf"<{ENT_NS}([^>]*)>\s+\.$"
    lit_body = r'"((?:[^"\\]|\\.)*)"'
    lit_pat = spo + lit_body + rf"(?:\^\^<{XSD_NS}(long|double)>)?\s+\.$"
    raw = spark.read.text(path)
    iri_rows = (
        raw.select(
            F.regexp_extract("value", iri_pat, 1).alias("s_enc"),
            F.regexp_extract("value", iri_pat, 2).alias("p_enc"),
            F.regexp_extract("value", iri_pat, 3).alias("o_enc"),
        )
        .filter(
            (F.col("s_enc") != "") & (F.col("p_enc") != "")
            & (F.col("o_enc") != "")
        )
        .select(
            F.expr("url_decode(s_enc)").alias("subj"),
            F.expr("url_decode(p_enc)").alias("pred"),
            F.expr("url_decode(o_enc)").alias("obj"),
            F.lit("iri").alias("obj_kind"),
        )
    )
    lit_rows = (
        raw.filter(~F.col("value").rlike(iri_pat))
        .select(
            F.col("value"),
            F.regexp_extract("value", lit_pat, 1).alias("s_enc"),
            F.regexp_extract("value", lit_pat, 2).alias("p_enc"),
            F.regexp_extract("value", lit_pat, 3).alias("o_lex"),
            F.regexp_extract("value", lit_pat, 4).alias("o_type"),
        )
        .filter(
            F.col("value").rlike(lit_pat)
            & (F.col("s_enc") != "") & (F.col("p_enc") != "")
        )
        .select(
            F.expr("url_decode(s_enc)").alias("subj"),
            F.expr("url_decode(p_enc)").alias("pred"),
            _unescape_literal(F.col("o_lex")).alias("obj"),
            F.when(F.col("o_type") == "", "string")
            .otherwise(F.col("o_type"))
            .alias("obj_kind"),
        )
    )
    return iri_rows.unionByName(lit_rows)


def kg_export(triples: DataFrame, analytics: DataFrame | None = None) -> DataFrame:
    """The full KG export line-set source (the CLI's ``--export-ntriples``):
    relation triples as entity-IRI objects, plus — when the analytics table
    is materialized — per-entity facts as attribute triples (pagerank /
    triangle / core counts as typed literals; the community label as an IRI
    object, since it IS an entity id stores can join back to the graph)."""
    rel = triples.select(
        F.col("subj").cast("string").alias("subj"),
        F.col("pred").cast("string").alias("pred"),
        F.col("obj").cast("string").alias("obj"),
        F.lit("iri").alias("obj_kind"),
    )
    if analytics is None:
        return rel
    attrs = attribute_triples(
        analytics, "entity_id", ["pr_q", "n_triangles", "community", "core"]
    ).withColumn(
        "obj_kind",
        F.when(F.col("pred") == "community", F.lit("iri")).otherwise(
            F.col("obj_kind")
        ),
    )
    return rel.unionByName(attrs)


def attribute_triples(
    df: DataFrame, subj_col: str, attr_cols: list[str]
) -> DataFrame:
    """(subj, pred, obj, obj_kind) literal triples from a per-entity
    attribute table (analytics scores, lifespans, degree counts): one
    triple per (row, column), predicate = column name, literal type from
    the column's Spark type (integers → xsd:long, floats → xsd:double,
    everything else a plain string). Feed the result to ``write_ntriples``
    to export attribute facts next to the relation triples."""
    fields = {f.name: f.dataType for f in df.schema.fields}
    parts = []
    for c in attr_cols:
        kind = _XSD_OF_SPARK.get(type(fields[c]), "string")
        parts.append(
            df.select(
                F.col(subj_col).cast("string").alias("subj"),
                F.lit(c).alias("pred"),
                F.col(c).cast("string").alias("obj"),
                F.lit(kind).alias("obj_kind"),
            ).filter(F.col("obj").isNotNull())
        )
    return functools.reduce(DataFrame.unionByName, parts)
