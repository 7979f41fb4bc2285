"""RuNNE JSONL scan + sink (reference semantics S1/S2, SURVEY.md §2.1).

File format (io_utils/io_utils.py:6-66): one object per line,
``{"id": int, "sentences": str, "ners": [[start, end_inclusive, TYPE], ...]}``
with ``ners`` optional. The loader converts inclusive ends to the half-open
internal form (io_utils.py:55-56), validates span bounds and whitespace
endpoints (io_utils.py:43-64), dedups + sorts spans by (start, end, type)
(io_utils.py:80-83), and rejects duplicate ids (io_utils.py:77-79). The
writer re-orders to ``[start, end-1, type]`` and sorts docs by id
(io_utils.py:92,99-102).

Everything below is declarative DataFrame code — validation is expressed as
boolean columns so bad rows can be counted/quarantined at scale instead of
aborting a 100 TB job (an ``strict`` flag reproduces the reference's
raise-on-first-error behavior for parity tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

JSONL_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("sentences", T.StringType()),
        T.StructField(
            "ners",
            T.ArrayType(
                # file form: [start, end_inclusive, type] as a 3-elem mixed
                # array arrives as array<string>; cast per element below
                T.ArrayType(T.StringType())
            ),
        ),
    ]
)

INTERNAL_SCHEMA = "id long, text string, ners array<struct<type:string,start:int,end:int>>"


def read_runne_jsonl(spark: SparkSession, path: str, strict: bool = True) -> DataFrame:
    """Scan + validate + normalize to the internal half-open form."""
    raw = spark.read.schema(JSONL_SCHEMA).json(path)
    spans = F.expr(
        """
        transform(coalesce(ners, array()), x -> named_struct(
            'type', x[2],
            'start', cast(x[0] as int),
            'end', cast(x[1] as int) + 1))
        """
    )
    df = raw.select(
        F.col("id"),
        F.col("sentences").alias("text"),
        spans.alias("ners"),
    )
    # half-open internal spans, deduped + sorted by (start, end, type)
    # exactly like io_utils.py:80-83
    df = df.withColumn(
        "ners",
        F.expr(
            """
            array_sort(array_distinct(ners), (a, b) ->
              CASE WHEN a.start < b.start THEN -1 WHEN a.start > b.start THEN 1
                   WHEN a.end   < b.end   THEN -1 WHEN a.end   > b.end   THEN 1
                   WHEN a.type  < b.type  THEN -1 WHEN a.type  > b.type  THEN 1
                   ELSE 0 END)
            """
        ),
    )
    df = df.withColumn(
        "invalid_spans",
        F.expr(
            """
            size(filter(ners, x ->
                 x.start < 0 OR x.end <= x.start OR x.end > length(text)
                 OR substring(text, x.start + 1, 1) RLIKE '^[\\\\s\\u00A0\\u200B]$'
                 OR substring(text, x.end, 1) RLIKE '^[\\\\s\\u00A0\\u200B]$'))
            """
        ),
    )
    if strict:
        bad = df.filter(F.col("invalid_spans") > 0).limit(1).collect()
        if bad:
            raise ValueError(f"invalid entity span in document id={bad[0]['id']}")
        dup = (
            df.groupBy("id").count().filter(F.col("count") > 1).limit(1).collect()
        )
        if dup:
            raise ValueError(f"duplicate document id {dup[0]['id']}")
    return df.drop("invalid_spans")


def write_runne_jsonl(df: DataFrame, path: str, with_text: bool = True) -> None:
    """Sink in the reference file form: ids ascending, inclusive ends
    (io_utils.py:89-103). Single output ordering is only meaningful for
    modest outputs; large jobs keep the partitioned form."""
    # the reference file form is a heterogeneous JSON array
    # [start:int, end_incl:int, "TYPE"] (io_utils.py:99-102) which to_json
    # cannot emit from a struct — build the ners fragment textually and
    # splice it into the JSON of the homogeneous columns
    ners_json = F.expr(
        """
        concat('[', concat_ws(',', transform(
          array_sort(ners, (a, b) ->
            CASE WHEN a.start < b.start THEN -1 WHEN a.start > b.start THEN 1
                 WHEN a.end   < b.end   THEN -1 WHEN a.end   > b.end   THEN 1
                 WHEN a.type  < b.type  THEN -1 WHEN a.type  > b.type  THEN 1
                 ELSE 0 END),
          x -> concat('[', cast(x.start as string), ',', cast(x.end - 1 as string),
                      ',"', x.type, '"]'))), ']')
        """
    )
    cols = [F.col("id")]
    if with_text:
        cols.append(F.col("text").alias("sentences"))
    base = (
        df.select(*cols, ners_json.alias("_ners_json"))
        .orderBy("id")
        .withColumn(
            "_head",
            F.to_json(F.struct(*[c for c in (["id", "sentences"] if with_text else ["id"])])),
        )
    )
    line = F.concat(
        F.expr("substring(_head, 1, length(_head) - 1)"),
        F.lit(',"ners":'),
        F.col("_ners_json"),
        F.lit("}"),
    )
    base.select(line.alias("value")).coalesce(1).write.mode("overwrite").text(path)
