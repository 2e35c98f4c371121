#!/usr/bin/env python3
"""spark-submit job entry for the extraction pipeline (north rule).

Cluster usage:

    zip -r cx_spark.zip contentextractor_spark
    spark-submit --py-files cx_spark.zip scripts/submit_extract.py \
        --input  s3://bucket/pages_iceberg_or_parquet \
        --output s3://bucket/pages_extracted \
        --lineage s3://bucket/pages_lineage \
        --num-buckets 4096

Resumability: re-submitting the identical command after a mid-run failure
anti-joins the lineage table and reprocesses ONLY buckets without a `done`
row for the current extractor version (plans/pipeline.resume_filter).

Local smoke:

    python scripts/submit_extract.py --demo
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from contentextractor_spark.plans.pipeline import build_spark, run_extraction  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="pages table path (parquet/Iceberg)")
    ap.add_argument("--output", help="extracted output table path")
    ap.add_argument("--lineage", help="lineage/metrics table path")
    ap.add_argument("--num-buckets", type=int, default=256)
    ap.add_argument(
        "--since", help="crawl window start (YYYY-MM-DD, inclusive) — with a"
        " crawl_date-partitioned input the window PRUNES at the scan"
    )
    ap.add_argument("--until", help="crawl window end (YYYY-MM-DD, inclusive)")
    ap.add_argument("--master", default=None, help="override master (local runs)")
    ap.add_argument(
        "--demo", action="store_true", help="run on synthetic pages into /tmp"
    )
    args = ap.parse_args()

    spark = build_spark(app="cx-extract", master=args.master or None)
    spark.sparkContext.setLogLevel("WARN")

    if args.demo:
        import tempfile

        from contentextractor_spark.plans.pipeline import PAGES_SCHEMA
        from contentextractor_spark.sources.pages import generate_pages

        tmp = tempfile.mkdtemp(prefix="cx_demo_")
        pages = spark.createDataFrame(generate_pages(500, seed=42), PAGES_SCHEMA)
        extracted, lineage = run_extraction(
            spark,
            pages,
            output_path=os.path.join(tmp, "out"),
            lineage_path=os.path.join(tmp, "lineage"),
            num_buckets=16,
        )
        n = extracted.count()
        errs = lineage.agg({"error_count": "sum"}).collect()[0][0]
        print(f"demo: {n} pages extracted, {errs} errors, output in {tmp}")
        return

    if not (args.input and args.output and args.lineage):
        ap.error("--input/--output/--lineage required (or --demo)")

    if args.since or args.until:
        # per-crawl incremental run: partition pruning via the crawl_date
        # layout (write_pages_by_crawl_date) — PartitionFilters, never a
        # row filter over the full store
        from contentextractor_spark.plans.pipeline import read_pages_window

        pages = read_pages_window(
            spark, args.input, args.since or "0001-01-01",
            args.until or "9999-12-31",
        )
    else:
        pages = spark.read.parquet(args.input)
    extracted, lineage = run_extraction(
        spark,
        pages,
        output_path=args.output,
        lineage_path=args.lineage,
        num_buckets=args.num_buckets,
    )
    done = lineage.filter("status = 'done'").count()
    print(f"extraction complete: {extracted.count()} rows, {done} buckets done")


if __name__ == "__main__":
    main()
