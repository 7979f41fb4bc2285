"""Reference-parity CLI: the engine's equivalent of the reference's
``recognize.py src.jsonl model_dir dst.jsonl`` (recognize.py:21-130), with
the Spark pipeline behind it and the pluggable scorer in place of the
trained TF model (pass ``--scorer gazetteer`` in-sandbox; a trained
transformer artifact would plug in via the TransformerScorer seam).

    python tools/recognize_cli.py src.jsonl dst.jsonl [--with-text]
                                   [--bert-dir DIR]   # real WordPiece vocab

Output format matches the reference sink: one JSON object per document, ids
ascending, ``ners`` as [start, end_inclusive, TYPE] (io_utils.py:89-103).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from runne_contrastive_ner_spark.operators.mentions import extract_mentions
from runne_contrastive_ner_spark.session import build_session
from runne_contrastive_ner_spark.sources.jsonl import read_runne_jsonl, write_runne_jsonl


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("src")
    ap.add_argument("dst")
    ap.add_argument("--with-text", action="store_true")
    ap.add_argument("--scorer", default="gazetteer", choices=["gazetteer"])
    ap.add_argument(
        "--bert-dir",
        default=None,
        help="BERT vocab dir (vocab.txt [+ tokenizer_config.json]) — switches"
        " subtokenization to real WordPiece, as the reference does with its"
        " model_dir tokenizer",
    )
    args = ap.parse_args()

    spark = build_session(app_name="recognize-cli")
    spark.sparkContext.setLogLevel("ERROR")

    docs = read_runne_jsonl(spark, args.src)
    as_transcripts = docs.select(
        F.col("id").cast("string").alias("conv_id"),
        F.lit(0).alias("turn_idx"),
        F.col("text"),
    )
    mentions = extract_mentions(as_transcripts, bert_dir=args.bert_dir)
    recognized = (
        docs.drop("ners")
        .join(
            mentions.groupBy("conv_id")
            .agg(F.collect_list(F.struct("type", "start", "end")).alias("ners"))
            .withColumn("id", F.col("conv_id").cast("long"))
            .drop("conv_id"),
            on="id",
            how="left",
        )
        .withColumn("ners", F.coalesce("ners", F.array()))
    )
    write_runne_jsonl(recognized, args.dst, with_text=args.with_text)
    n = recognized.count()
    print(f"recognized {n} documents -> {args.dst}")
    spark.stop()


if __name__ == "__main__":
    main()
