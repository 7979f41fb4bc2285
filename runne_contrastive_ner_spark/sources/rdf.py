"""N-Triples export/scan — the KG interchange surface.

A knowledge graph that can't leave the warehouse isn't one: this module
writes the materialized triple table as W3C N-Triples lines (one triple
per line, `<subj IRI> <pred IRI> <obj> .`) so any RDF store can load the
graph, and reads such files back into the engine's (subj, pred, obj)
shape. Distributed text write/scan — one line per row, no driver-side
formatting. The scan is TOLERANT of third-party N-Triples (generic IRIs,
blank nodes, language tags, arbitrary datatypes) and accounts for what it
cannot parse (``ntriples_scan_report`` / ``ntriples_rejects``) instead of
dropping lines silently.

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


# ONE pattern for BOTH UCHAR forms, decoded in ONE split/zip pass: a
# staged two-pass decode (\U first, then \u) can MINT a backslash
# (\U0000005C) that the later pass misreads as starting a new escape —
# "\U0000005Cu0041" means backslash + literal 'u0041', not 'A' (review
# finding, confirmed by repro). A single simultaneous pass scans only the
# original text, so no decoded character is ever re-read as an escape.
_UCHAR_PAT = r"\\(u[0-9A-Fa-f]{4}|U[0-9A-Fa-f]{8})"


def _u8_char(hex8: Column) -> Column:
    """8 hex digits of a ``\\U`` UCHAR → its character, all JVM-side: the
    codepoint is mapped to its UTF-16BE form — the raw hex quad inside
    the BMP, the computed surrogate pair above it — then unhex + UTF-16BE
    decode (same machinery the ``\\uXXXX`` path uses). Tolerance: a
    codepoint beyond U+10FFFF or inside the surrogate gap (both
    grammar-invalid) keeps its escape text raw rather than decoding to
    garbage — the tolerant-scan contract, per term."""
    cp = F.conv(hex8, 16, 10).cast("long")
    bmp = F.lpad(F.hex(cp), 4, "0")
    cpp = cp - F.lit(0x10000)
    pair = F.concat(
        F.lpad(F.hex(F.lit(0xD800) + F.shiftright(cpp, 10)), 4, "0"),
        F.lpad(F.hex(F.lit(0xDC00) + cpp.bitwiseAND(F.lit(0x3FF))), 4, "0"),
    )
    valid = (cp <= 0x10FFFF) & ~((cp >= 0xD800) & (cp <= 0xDFFF))
    return (
        F.when(valid & (cp >= 0x10000), F.decode(F.unhex(pair), "UTF-16BE"))
        .when(valid, F.decode(F.unhex(bmp), "UTF-16BE"))
        .otherwise(F.concat(F.lit("\\U"), hex8))
    )


def _uchar_char(c: Column) -> Column:
    """One captured UCHAR payload — ``uXXXX`` or ``UXXXXXXXX`` (or the
    empty zip_with pad) — to its character. The ``\\u`` branch carries the
    SAME surrogate-gap guard as ``_u8_char``: a lone ``\\uD800``-style
    escape (including JSON-style surrogate PAIRS, which the N-Triples
    grammar does not allow — UCHAR encodes a scalar value) keeps its
    escape text raw instead of feeding UTF-16BE decode a malformed unit,
    which would ABORT the whole scan with MALFORMED_CHARACTER_CODING
    (review finding, confirmed by repro) — the opposite of the tolerant
    contract."""
    hex4 = c.substr(F.lit(2), F.lit(4))
    cp4 = F.conv(hex4, 16, 10).cast("long")
    lone_surrogate = (cp4 >= 0xD800) & (cp4 <= 0xDFFF)
    return (
        F.when(c == "", F.lit(""))
        .when(
            c.startswith("u") & lone_surrogate, F.concat(F.lit("\\"), c)
        )
        .when(c.startswith("u"), F.decode(F.unhex(hex4), "UTF-16BE"))
        .otherwise(_u8_char(c.substr(F.lit(2), F.lit(8))))
    )


def _dec_segment(seg: Column) -> Column:
    """Decode escape sequences inside one backslash-pair-free segment:
    every remaining backslash starts a genuine escape, so plain
    replacement is unambiguous. Handles every N-Triples ECHAR (tbnrf"')
    plus ANY BMP ``\\uXXXX`` UCHAR, not just the C0 range the writer
    emits: the segment splits on the UCHAR pattern, each captured hex
    payload becomes its raw character via unhex + UTF-16BE decode (all
    JVM-side — a literal NUL in a py4j string would be protocol-hostile),
    and parts interleave back. Astral ``\\U00XXXXXX`` escapes (8 hex,
    never writer-emitted) decode via a computed surrogate pair
    (``_u8_char``; VERDICT r7 item 5 — a foreign file with emoji-bearing
    literals previously kept the escape text); codepoints beyond U+10FFFF
    or in the surrogate gap stay raw. BOTH UCHAR forms decode in the SAME
    split/zip pass over the original text (see ``_UCHAR_PAT``): a decoded
    backslash (``\\u005C`` / ``\\U0000005C``) can therefore never be
    re-read as starting another escape. One rlike guards the UCHAR
    machinery — escape-free segments pay only the short decodes."""
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
        F.zip_with(parts, codes, lambda p, c: F.concat(p, _uchar_char(c))),
        "",
    )
    return F.when(out.rlike(r"\\[uU]"), decoded).otherwise(out)


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
                    F.lit(
                        "' (expected iri|string|long|double; 'bnode' is a "
                        "read-only kind from foreign scans — the engine "
                        "namespace has no IRI form for it)"
                    ),
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


# Full N-Triples term grammar for the tolerant scan (VERDICT r6 item 4):
# subject = IRI or blank node, predicate = IRI, object = IRI, blank node,
# or literal with an optional language tag / datatype IRI. All groups
# inside the alternatives are non-capturing, so the line pattern exposes
# exactly three captures: (1) subject term, (2) predicate IRI content,
# (3) object term.
_BNODE = r"_:\S+"
_LITERAL = r'"(?:[^"\\]|\\.)*"'
_OBJ_TERM = rf"<[^>]*>|{_BNODE}|{_LITERAL}(?:@[A-Za-z][A-Za-z0-9-]*|\^\^<[^>]*>)?"
_LINE_PAT = rf"^\s*(<[^>]*>|{_BNODE})\s+<([^>]*)>\s+({_OBJ_TERM})\s*\.\s*$"
_BLANK_OR_COMMENT = r"^\s*(#.*)?$"


def _decode_or_raw(content: Column, ns: str) -> Column:
    """Engine-namespace IRI content decodes back to the bare id; any other
    IRI passes through as the raw IRI text (http://..., urn:uuid:..., a
    third party's namespace) so foreign graphs keep their identity. The
    decode is ``try_url_decode`` with a raw-IRI fallback: a FOREIGN file
    may use the engine prefix with content that is not valid
    percent-encoding (e.g. ``urn:kg:ent:100%off``), and the tolerant scan
    must keep the row rather than fail the whole job on it."""
    return F.when(
        content.startswith(ns),
        F.coalesce(
            F.try_url_decode(
                content.substr(F.lit(len(ns) + 1), F.length(content))
            ),
            content,
        ),
    ).otherwise(content)


def read_ntriples(spark: SparkSession, path: str) -> DataFrame:
    """Scan N-Triples back to (subj, pred, obj, obj_kind). Engine files
    (``write_ntriples`` output) decode to the original bare ids; FOREIGN
    files are tolerated rather than silently dropped (VERDICT r6 item 4 /
    ADVICE r6): generic IRIs in any position pass through as the raw IRI
    text, blank-node terms pass through as ``_:label`` (``obj_kind`` =
    'bnode' — a read-only kind; ``write_ntriples`` rejects it since the
    engine has no IRI form for foreign bnodes), language-tagged literals
    ("x"@en) and literals with any datatype other than xsd:long/xsd:double
    (e.g. "5"^^xsd:integer, an explicit "x"^^xsd:string) land as
    ``obj_kind='string'`` with the unescaped lexical form. Literal
    unescaping covers the full ECHAR set and BOTH UCHAR forms — BMP
    ``\\uXXXX`` and astral ``\\U00XXXXXX`` (surrogate-pair decode;
    grammar-invalid codepoints keep their escape text). Lines that do not
    parse are dropped from THIS scan but are not silent: count them with
    ``ntriples_scan_report`` or inspect them with ``ntriples_rejects``."""
    subj_term = F.regexp_extract("value", _LINE_PAT, 1)
    pred_content = F.regexp_extract("value", _LINE_PAT, 2)
    obj_term = F.regexp_extract("value", _LINE_PAT, 3)

    subj_iri = F.regexp_extract(subj_term, r"^<([^>]*)>$", 1)
    subj = F.when(
        subj_term.startswith("<"), _decode_or_raw(subj_iri, ENT_NS)
    ).otherwise(subj_term)
    pred = _decode_or_raw(pred_content, PRED_NS)

    obj_iri = F.regexp_extract(obj_term, r"^<([^>]*)>$", 1)
    lexical = F.regexp_extract(obj_term, rf"^({_LITERAL})", 1)
    lexical = lexical.substr(F.lit(2), F.length(lexical) - 2)
    datatype = F.regexp_extract(obj_term, r"\^\^<([^>]*)>$", 1)
    obj_kind = (
        F.when(obj_term.startswith("<"), F.lit("iri"))
        .when(obj_term.startswith("_:"), F.lit("bnode"))
        .when(datatype == f"{XSD_NS}long", F.lit("long"))
        .when(datatype == f"{XSD_NS}double", F.lit("double"))
        .otherwise(F.lit("string"))
    )
    obj = (
        F.when(obj_term.startswith("<"), _decode_or_raw(obj_iri, ENT_NS))
        .when(obj_term.startswith("_:"), obj_term)
        .otherwise(_unescape_literal(lexical))
    )
    # ONE pass over the file: a single line-grammar rlike classifies, and
    # the matching rows project through one conditional expression tree.
    return (
        spark.read.text(path)
        .filter(F.col("value").rlike(_LINE_PAT))
        .select(
            subj.alias("subj"),
            pred.alias("pred"),
            obj.alias("obj"),
            obj_kind.alias("obj_kind"),
        )
    )


def ntriples_rejects(spark: SparkSession, path: str) -> DataFrame:
    """Side output for the tolerant scan: the lines ``read_ntriples``
    dropped that are NOT blank lines or ``#`` comments — i.e. genuinely
    malformed (or beyond-grammar, e.g. N-Quads) input a caller should know
    about. One column ``value`` with the raw line."""
    return (
        spark.read.text(path)
        .filter(~F.col("value").rlike(_LINE_PAT))
        .filter(~F.col("value").rlike(_BLANK_OR_COMMENT))
    )


def ntriples_scan_report(spark: SparkSession, path: str) -> dict:
    """Eager one-pass accounting of a scan: ``{'parsed': n, 'rejected': n,
    'blank_or_comment': n}`` — the skipped-line count VERDICT r6 item 4
    asks for, as one distributed aggregate (no second file pass per
    class)."""
    row = (
        spark.read.text(path)
        .select(
            F.count(F.when(F.col("value").rlike(_LINE_PAT), 1)).alias("parsed"),
            F.count(
                F.when(
                    ~F.col("value").rlike(_LINE_PAT)
                    & F.col("value").rlike(_BLANK_OR_COMMENT),
                    1,
                )
            ).alias("blank_or_comment"),
            F.count(
                F.when(
                    ~F.col("value").rlike(_LINE_PAT)
                    & ~F.col("value").rlike(_BLANK_OR_COMMENT),
                    1,
                )
            ).alias("rejected"),
        )
        .first()
    )
    return {
        "parsed": row["parsed"],
        "rejected": row["rejected"],
        "blank_or_comment": row["blank_or_comment"],
    }


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
