#!/usr/bin/env python
"""Scan an N-Triples file/directory with the tolerant grammar and print a
one-line JSON accounting report (VERDICT r7 item 7: the skipped-line
accounting existed as library calls — ``sources.rdf.ntriples_scan_report``
/ ``ntriples_rejects`` — but no job surfaced it; an operator ingesting a
foreign dump needs the numbers in a log line, not an API).

    python tools/ntriples_scan.py /path/to/dump.nt \
        [--rejects-out /path/dir] [--sample-rejects N]

Prints ``{"path": ..., "parsed": n, "rejected": n, "blank_or_comment": n,
"reject_sample": [...]}``. ``--rejects-out`` additionally writes the full
reject line set as text (distributed write — the sample in the log stays
bounded however large the dump is). Exit code 0 when nothing was rejected,
3 otherwise — scriptable as an ingest gate.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("path", help="N-Triples file or directory")
    ap.add_argument(
        "--rejects-out",
        help="also write the full reject line set (text) to this directory",
    )
    ap.add_argument(
        "--sample-rejects",
        type=int,
        default=5,
        help="max reject lines echoed inline in the report (default 5)",
    )
    ap.add_argument("--master", default="local[8]")
    args = ap.parse_args(argv)

    from runne_contrastive_ner_spark.session import build_session
    from runne_contrastive_ner_spark.sources.rdf import (
        ntriples_rejects,
        ntriples_scan_report,
    )

    spark = build_session(master=args.master)
    try:
        report: dict = {"path": args.path}
        report.update(ntriples_scan_report(spark, args.path))
        if report["rejected"]:
            # persist: the sample collect and the full write must not each
            # re-scan a (potentially 100 GB) dump a second and third time
            rejects = ntriples_rejects(spark, args.path).persist()
            try:
                report["reject_sample"] = [
                    r["value"]
                    for r in rejects.limit(args.sample_rejects).collect()
                ]
                if args.rejects_out:
                    rejects.write.mode("overwrite").text(args.rejects_out)
                    report["rejects_out"] = args.rejects_out
            finally:
                rejects.unpersist()
        print(json.dumps(report))
        return 0 if report["rejected"] == 0 else 3
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
