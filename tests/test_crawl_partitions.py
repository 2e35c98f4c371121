"""Crawl-date partition pruning (r4) — the incremental-run half of the
north rule's Iceberg layout (days(warc_ts) next to bucket(N, url)).

The scale claim under test: an extraction over one crawl window must
prune every other day AT THE SCAN (PartitionFilters), never filter
100 TB row-by-row.  Pinned two ways: the physical plan carries the
predicate as a PartitionFilter (not a data filter), and the files
actually opened all live under the matching crawl_date= directory.
"""

import datetime

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def day_store(spark, tmp_path_factory):
    from contentextractor_spark.plans.pipeline import write_pages_by_crawl_date

    path = str(tmp_path_factory.mktemp("pages_by_day"))
    rows = [
        (f"u{i}", datetime.datetime(2026, 1, 1 + i % 3, 12, 0, 0),
         b"<html><body><p>x</p></body></html>", "x", "en")
        for i in range(90)
    ]
    pages = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string"
    )
    write_pages_by_crawl_date(pages, path)
    return path


def test_window_read_prunes_partitions(spark, day_store):
    from contentextractor_spark.plans.pipeline import read_pages_window

    win = read_pages_window(spark, day_store, "2026-01-02", "2026-01-02")
    assert win.count() == 30
    plan = win._jdf.queryExecution().executedPlan().toString()
    # the date predicate must live in PartitionFilters — a PushedFilters/
    # post-scan Filter placement would mean every day's files get opened
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and "crawl_date" in pf[0], plan
    files = [
        r[0] for r in win.select(F.input_file_name()).distinct().collect()
    ]
    assert files and all("crawl_date=2026-01-02" in f for f in files), files


def test_window_read_roundtrips_all_columns(spark, day_store):
    from contentextractor_spark.plans.pipeline import read_pages_window

    win = read_pages_window(spark, day_store, "2026-01-01", "2026-01-03")
    assert win.count() == 90
    assert {"url", "warc_ts", "html", "text", "lang", "crawl_date"} <= set(
        win.columns
    )
    # warc_ts survives partitioning (crawl_date is DERIVED, not a move)
    d2 = win.filter("crawl_date = date '2026-01-02'").select("warc_ts").first()[0]
    assert d2.day == 2


def test_extraction_over_window_composes(spark, day_store):
    from contentextractor_spark.plans.pipeline import (
        extract_pages,
        read_pages_window,
    )

    win = read_pages_window(spark, day_store, "2026-01-03", "2026-01-03")
    out = extract_pages(win.select("url", "html"), num_buckets=4)
    assert out.count() == 30
