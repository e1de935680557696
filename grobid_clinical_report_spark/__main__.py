"""spark-submit entrypoint (SURVEY.md §2.6 batch CLI parity).

Mirrors the reference CLI (`GrobidMedicalReportMain.java:136-218` /
`ProcessEngineMedical.java`) commands as extraction modes:

    spark-submit --py-files grobid_clinical_report_spark.zip \
        scripts/submit_job.py \
        --input  /data/documents        (parquet dir or Iceberg table path)
        --output /data/extracted \
        --mode   extract_full           (extract_header | extract_leftnote |
                                         ner | parse_medic | parse_patient |
                                         parse_dateline)
        --buckets 256 --max-spans 50000 [--no-resume] [--generate N]

`--generate N` materializes the seeded synthetic corpus first (local tiers).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="grobid_clinical_report_spark")
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    from .pipeline import FLAT_MODES

    p.add_argument(
        "--mode", default="extract_full", choices=sorted(FLAT_MODES)
    )
    p.add_argument("--buckets", type=int, default=8)
    p.add_argument("--max-spans", type=int, default=50_000)
    p.add_argument("--no-resume", action="store_true")
    p.add_argument("--generate", type=int, default=0,
                   help="generate N synthetic docs into --input first")
    p.add_argument("--cpus", type=int, default=None)
    p.add_argument(
        "--process-quarantine", action="store_true",
        help="after the main pass, window+extract quarantined whales into "
             "bucket=quarantine (second-pass long-document path)",
    )
    p.add_argument(
        "--stage-buckets", action="store_true",
        help="materialize a bucket-partitioned copy of the input first so "
             "each bucket job scans 1/N via directory pruning (use when the "
             "source is NOT already bucket-partitioned)",
    )
    args = p.parse_args(argv)

    if args.generate:
        from .datagen import write_documents_parquet

        write_documents_parquet(
            args.input, n_docs=args.generate, shards=max(args.buckets * 4, 16)
        )

    from .runner import process_quarantined, run_extraction_job
    from .session import get_spark

    spark = get_spark(app=f"extract-{args.mode}", cpus=args.cpus)
    from .pipeline import apply_split_hint

    apply_split_hint(spark, args.mode)
    try:
        metrics = run_extraction_job(
            spark,
            args.input,
            args.output,
            mode=args.mode,
            n_buckets=args.buckets,
            max_spans=args.max_spans,
            resume=not args.no_resume,
            stage_buckets=args.stage_buckets,
        )
        if args.process_quarantine and metrics["quarantined"]:
            metrics["quarantine_pass"] = process_quarantined(
                spark, args.input, args.output,
                mode=args.mode, max_spans=args.max_spans,
            )
    finally:
        spark.stop()
    print(json.dumps(metrics))
    return 0


if __name__ == "__main__":
    sys.exit(main())
