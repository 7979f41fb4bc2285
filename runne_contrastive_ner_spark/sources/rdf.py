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
(iri | string | long | double — any other value fails the write with an
actionable error, since the scan-back grammar would drop it) serializes
per row; without one, every object is an IRI (the original contract). ``attribute_triples`` builds the
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


# C0 control codepoints without a short N-Triples escape (tab/LF/CR have
# \t \n \r): grammar-legal raw inside a literal, but raw NUL in a text
# file is hostile to downstream tooling, so the writer emits \uXXXX and
# the reader decodes it.
_C0_CODES = [c for c in range(0x20) if c not in (0x09, 0x0A, 0x0D)]


_C0_CLASS = "[" + "".join(f"\\x{c:02x}" for c in _C0_CODES) + "]"


def _escape_literal(col: Column) -> Column:
    """N-Triples string-literal escaping (JVM-side): backslash first, then
    quote, newline, CR, tab (the characters the grammar forbids raw), then
    the remaining C0 controls as ``\\uXXXX`` UCHAR escapes. The 29-step
    C0 chain only runs on strings that contain a C0 character (one
    char-class rlike guards it) — on a clean corpus the per-literal cost
    stays at the five short escapes."""
    out = F.regexp_replace(col, r"\\", r"\\\\")
    out = F.regexp_replace(out, '"', '\\\\"')
    out = F.regexp_replace(out, "\n", r"\\n")
    out = F.regexp_replace(out, "\r", r"\\r")
    out = F.regexp_replace(out, "\t", r"\\t")
    c0 = out
    for c in _C0_CODES:
        c0 = F.regexp_replace(c0, f"\\x{c:02x}", f"\\\\u{c:04X}")
    return F.when(out.rlike(_C0_CLASS), c0).otherwise(out)


_UCHAR_PAT = r"\\u([0-9A-Fa-f]{4})"


def _dec_segment(seg: Column) -> Column:
    """Decode escape sequences inside one backslash-pair-free segment:
    every remaining backslash starts a genuine escape, so plain
    replacement is unambiguous. Handles every N-Triples ECHAR (tbnrf"')
    plus ANY BMP ``\\uXXXX`` UCHAR, not just the C0 range the writer
    emits: the segment splits on the UCHAR pattern, each captured hex
    quad becomes its raw character via unhex + UTF-16BE decode (all
    JVM-side — a literal NUL in a py4j string would be protocol-hostile),
    and parts interleave back. Astral ``\\U00XXXXXX`` escapes (8 hex,
    never writer-emitted) pass through as text. One substring test guards
    the UCHAR machinery — escape-free segments pay only the short
    decodes."""
    out = F.regexp_replace(seg, r"\\t", "\t")
    out = F.regexp_replace(out, r"\\r", "\r")
    out = F.regexp_replace(out, r"\\n", "\n")
    out = F.regexp_replace(out, r"\\b", "\b")
    out = F.regexp_replace(out, r"\\f", "\f")
    out = F.regexp_replace(out, r"\\'", "'")
    out = F.regexp_replace(out, r'\\"', '"')
    parts = F.split(out, _UCHAR_PAT)
    codes = F.concat(
        F.regexp_extract_all(out, F.lit(_UCHAR_PAT), F.lit(1)),
        F.array(F.lit("")),
    )
    decoded = F.array_join(
        F.zip_with(
            parts, codes, lambda p, c: F.concat(p, F.decode(F.unhex(c), "UTF-16BE"))
        ),
        "",
    )
    return F.when(out.contains("\\u"), decoded).otherwise(out)


def _unescape_literal(col: Column) -> Column:
    """Inverse of ``_escape_literal``, sentinel-free: split on escaped
    backslashes (``\\\\`` pairs), decode the shorter escapes within each
    segment — where a backslash can only start a real escape — and rejoin
    with single backslashes. Unlike an in-band sentinel, this corrupts no
    input: foreign N-Triples with raw control characters (grammar-legal)
    pass through untouched."""
    return F.array_join(F.transform(F.split(col, r"\\\\"), _dec_segment), "\\")


def _obj_term(kind_col: Column, obj_str: Column) -> Column:
    """Serialize one object term by kind: IRI, typed literal, or plain
    string literal (xsd:string is the implied type per the spec). An
    ``obj_kind`` outside iri|string|long|double fails the job with an
    actionable error rather than writing a line ``read_ntriples`` would
    silently drop."""
    iri = F.concat(F.lit(f"<{ENT_NS}"), F.url_encode(obj_str), F.lit(">"))
    quoted = F.concat(F.lit('"'), _escape_literal(obj_str), F.lit('"'))
    typed = F.concat(
        quoted, F.lit(f"^^<{XSD_NS}"), kind_col, F.lit(">")
    )
    return (
        F.when(kind_col == "iri", iri)
        .when(kind_col == "string", quoted)
        .when(kind_col.isin("long", "double"), typed)
        .otherwise(
            F.raise_error(
                F.concat(
                    F.lit("write_ntriples: unsupported obj_kind '"),
                    # concat propagates NULL — a null kind would otherwise
                    # degrade the whole message to an unexplained null
                    F.coalesce(kind_col, F.lit("NULL")),
                    F.lit("' (expected iri|string|long|double)"),
                )
            )
        )
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
    ``obj_kind`` one of iri | string | long | double. Literal unescaping
    covers the full ECHAR set and any BMP ``\\uXXXX`` UCHAR (foreign files
    included); astral ``\\U00XXXXXX`` escapes pass through as text. Lines
    that match neither shape (comments, blank lines) are dropped."""
    spo = rf"^<{ENT_NS}([^>]*)>\s+<{PRED_NS}([^>]*)>\s+"
    iri_pat = spo + rf"<{ENT_NS}([^>]*)>\s+\.$"
    lit_body = r'"((?:[^"\\]|\\.)*)"'
    lit_pat = spo + lit_body + rf"(?:\^\^<{XSD_NS}(long|double)>)?\s+\.$"
    # ONE pass over the file: each line is classified (IRI-object first —
    # the patterns are disjoint on the object term, but IRI is the common
    # case) and projected through the matching branch of a single
    # conditional struct; the old two-subquery union read and
    # regex-matched every split twice.
    iri_row = F.struct(
        F.url_decode(F.regexp_extract("value", iri_pat, 1)).alias("subj"),
        F.url_decode(F.regexp_extract("value", iri_pat, 2)).alias("pred"),
        F.url_decode(F.regexp_extract("value", iri_pat, 3)).alias("obj"),
        F.lit("iri").alias("obj_kind"),
    )
    lit_type = F.regexp_extract("value", lit_pat, 4)
    lit_row = F.struct(
        F.url_decode(F.regexp_extract("value", lit_pat, 1)).alias("subj"),
        F.url_decode(F.regexp_extract("value", lit_pat, 2)).alias("pred"),
        _unescape_literal(F.regexp_extract("value", lit_pat, 3)).alias("obj"),
        F.when(lit_type == "", "string").otherwise(lit_type).alias("obj_kind"),
    )
    return (
        spark.read.text(path)
        .select(
            F.when(F.col("value").rlike(iri_pat), iri_row)
            .when(F.col("value").rlike(lit_pat), lit_row)
            .alias("t")
        )
        .filter(F.col("t").isNotNull())
        .select("t.*")
    )


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
