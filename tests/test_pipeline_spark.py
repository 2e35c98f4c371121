"""Spark end-to-end pipeline tests: extraction stage, lineage, resume.

Differential check: the Spark mapInPandas output must equal the driver-side
per-document oracle (extract_document) row for row — Arrow round-trip
equality (SURVEY.md §5.2-3/4).
"""

import pytest

from contentextractor_spark.extractor import extract_document
from contentextractor_spark.plans.pipeline import (
    PAGES_SCHEMA,
    extract_pages,
    lineage_metrics,
    resume_filter,
    run_extraction,
)
from contentextractor_spark.sources.pages import generate_pages

N = 120


@pytest.fixture(scope="module")
def pages_pdf():
    return generate_pages(N, seed=42)


@pytest.fixture(scope="module")
def pages_df(spark, pages_pdf):
    df = spark.createDataFrame(pages_pdf, schema=PAGES_SCHEMA)
    df.cache().count()
    return df


def test_generator_deterministic(pages_pdf):
    again = generate_pages(N, seed=42)
    assert list(again["url"]) == list(pages_pdf["url"])
    assert all(a == b for a, b in zip(again["html"], pages_pdf["html"]))


def test_generator_host_skew(pages_pdf):
    hosts = pages_pdf["url"].str.extract(r"https://([^/]+)/")[0]
    counts = hosts.value_counts()
    # Zipf(1.2): top host should dominate
    assert counts.iloc[0] > N / 10


def test_extract_pages_rows_and_schema(spark, pages_df):
    out = extract_pages(pages_df, num_buckets=8)
    rows = out.collect()
    assert len(rows) == N
    names = out.schema.names
    assert names[:5] == ["url", "title", "description", "keywords", "main_text"]
    ok = [r for r in rows if r.status == "ok"]
    assert len(ok) == N  # synthetic archetypes never hit error paths
    nonempty = [r for r in rows if r.main_text]
    assert len(nonempty) > N * 0.5


def test_spark_matches_driver_oracle(spark, pages_df, pages_pdf):
    """Byte-identical per url: Spark output == per-doc oracle."""
    out = {r.url: r for r in extract_pages(pages_df, num_buckets=8).collect()}
    assert len(out) == N
    for _, row in pages_pdf.iterrows():
        oracle = extract_document(bytes(row["html"]))
        got = out[row["url"]]
        assert got.main_text == oracle.main_text, row["url"]
        assert got.title == oracle.title
        assert got.keyword_list == oracle.keyword_list
        assert [
            (s.start_line, s.end_line, s.char_start, s.char_end) for s in got.spans
        ] == oracle.spans


def test_lineage_metrics(spark, pages_df):
    extracted = extract_pages(pages_df, num_buckets=8)
    lineage = lineage_metrics(extracted).collect()
    assert sum(r.row_count for r in lineage) == N
    assert all(r.status == "done" for r in lineage)
    assert all(r.url_min <= r.url_max for r in lineage)
    assert len(lineage) <= 8


def test_lineage_metrics_refuses_mixed_run_table(spark, pages_df):
    """A lineage row is a commit record for ONE run: over a table mixing
    run_ids, first('run_id') could stamp counts spanning every run with an
    orphan run's id — committing rows a crashed run left behind (r3
    review).  The aggregation must raise, not guess."""
    from pyspark.sql import functions as F

    extracted = extract_pages(pages_df, num_buckets=4)
    mixed = extracted.withColumn("run_id", F.lit("run_a")).unionAll(
        extracted.withColumn("run_id", F.lit("run_b"))
    )
    with pytest.raises(Exception, match="spans multiple run_ids"):
        lineage_metrics(mixed).collect()
    # single-run tables are unaffected
    one = lineage_metrics(extracted.withColumn("run_id", F.lit("run_a")))
    assert all(r.run_id == "run_a" for r in one.collect())


def test_resume_filter_drops_done_buckets(spark, pages_df):
    extracted = extract_pages(pages_df, num_buckets=8)
    lineage = lineage_metrics(extracted)
    remaining = resume_filter(pages_df, lineage, num_buckets=8)
    assert remaining.count() == 0  # everything done

    # partial lineage: keep only buckets NOT yet done
    partial = lineage.filter("bucket_id < 4")
    remaining2 = resume_filter(pages_df, partial, num_buckets=8)
    from pyspark.sql import functions as F

    left = remaining2.withColumn(
        "b", F.pmod(F.xxhash64("url", F.lit(42)), F.lit(8)).cast("int")
    )
    assert left.filter("b < 4").count() == 0
    assert remaining2.count() > 0


def test_run_extraction_end_to_end(spark, pages_df, tmp_path):
    out_path = str(tmp_path / "out")
    lin_path = str(tmp_path / "lineage")
    extracted, lineage = run_extraction(
        spark, pages_df, output_path=out_path, lineage_path=lin_path, num_buckets=8
    )
    assert extracted.count() == N
    total = sum(r.row_count for r in lineage.collect())
    assert total == N

    # resume: second run must process 0 new rows (idempotent)
    extracted2, lineage2 = run_extraction(
        spark, pages_df, output_path=out_path, lineage_path=lin_path, num_buckets=8
    )
    assert extracted2.count() == N  # output unchanged — no duplicate appends


def test_explain_single_shuffle(spark, pages_df):
    """Plan audit: exactly one Exchange below the Python map stage."""
    out = extract_pages(pages_df, num_buckets=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan


def test_explain_column_pruning_reaches_scan(spark, tmp_path, pages_pdf):
    """Plan audit: the parquet scan must read ONLY (url, html) — warc_ts /
    text / lang are pruned (SURVEY.md §4.2 'just don't select(*)')."""
    path = str(tmp_path / "pages_pq")
    spark.createDataFrame(pages_pdf, schema=PAGES_SCHEMA).write.parquet(path)
    pages = spark.read.parquet(path)
    out = extract_pages(pages, num_buckets=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ReadSchema: struct<url:string,html:binary>" in plan, plan


def test_bucketed_tables_join_without_shuffle(spark, pages_df):
    """Iceberg-layout stand-in: two url-bucketed tables sort-merge join with
    ZERO Exchange in the plan (co-located join)."""
    from pyspark.sql import functions as F

    from contentextractor_spark.plans.pipeline import (
        extract_pages,
        write_bucketed_table,
    )

    extracted = extract_pages(pages_df, num_buckets=8).select("url", "main_text")
    write_bucketed_table(pages_df.select("url", "lang"), "pages_meta_b", 8)
    write_bucketed_table(extracted, "extracted_b", 8)
    a = spark.table("pages_meta_b")
    b = spark.table("extracted_b")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = a.join(b, "url")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert joined.count() == pages_df.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS pages_meta_b")
        spark.sql("DROP TABLE IF EXISTS extracted_b")


def test_bucket_balance_under_host_skew(spark):
    """The Zipf(1.2) host skew must NOT translate into bucket skew: full-url
    hashing spreads the hot host uniformly (north rule salting)."""
    from pyspark.sql import functions as F

    pdf = generate_pages(2000, seed=42)
    df = spark.createDataFrame(pdf, schema=PAGES_SCHEMA)
    counts = [
        r.n
        for r in df.select(
            F.pmod(F.xxhash64("url", F.lit(42)), F.lit(16)).cast("int").alias("b")
        )
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    ]
    assert len(counts) == 16
    assert max(counts) / min(counts) < 1.8  # near-uniform despite Zipf hosts
    # while the HOST distribution itself is wildly skewed:
    hosts = pdf["url"].str.extract(r"https://([^/]+)/")[0].value_counts()
    assert hosts.iloc[0] / hosts.iloc[-1] > 10


def test_pipeline_error_isolation_and_lineage_count(spark):
    """A poisoned page (fractional px font size throws in the reference)
    becomes a status=error row and a lineage error_count — the job survives."""
    import pandas as pd

    bad = '<html><body><span style="font-size:9.5px">x</span></body></html>'
    good = "<html><body><div><p>perfectly fine content line with many words here</p></div></body></html>"
    pdf = pd.DataFrame(
        {
            "url": pd.Series(["https://a/bad", "https://a/good"], dtype="string"),
            "warc_ts": pd.Series([pd.Timestamp("2026-01-01")] * 2),
            "html": pd.Series([bad.encode(), good.encode()], dtype=object),
            "text": pd.Series(["", ""], dtype="string"),
            "lang": pd.Series(["en", "en"], dtype="string"),
        }
    )
    df = spark.createDataFrame(pdf, schema=PAGES_SCHEMA)
    out = extract_pages(df, num_buckets=2)
    rows = {r.url: r for r in out.collect()}
    assert rows["https://a/bad"].status == "error:ValueError"
    assert rows["https://a/bad"].main_text == ""
    assert rows["https://a/good"].status == "ok"
    assert rows["https://a/good"].main_text != ""
    lineage = lineage_metrics(out)
    assert sum(r.error_count for r in lineage.collect()) == 1


def test_resume_version_bump_reprocesses(spark, pages_df):
    """Lineage rows are keyed by (bucket, extractor_version): bumping the
    version invalidates every `done` row → full reprocess (north star:
    idempotent resume tied to the extractor-version hash)."""
    from pyspark.sql import functions as F

    extracted = extract_pages(pages_df, num_buckets=8)
    lineage = lineage_metrics(extracted)
    # same version → nothing left
    assert resume_filter(pages_df, lineage, num_buckets=8).count() == 0
    # old lineage from a previous extractor version → everything reprocessed
    stale = lineage.withColumn("extractor_version", F.lit("cx-spark-0.0.1"))
    assert resume_filter(pages_df, stale, num_buckets=8).count() == N


def test_resume_corrupt_lineage_raises(spark, pages_df, tmp_path):
    """ADVICE r1: a corrupt lineage table must fail LOUDLY — only
    path-not-found may silently mean 'no lineage yet → full run'."""
    lin_path = tmp_path / "lineage"
    lin_path.mkdir()
    (lin_path / "part-00000.parquet").write_bytes(b"this is not parquet")
    with pytest.raises(Exception) as ei:
        run_extraction(spark, pages_df, lineage_path=str(lin_path), num_buckets=8)
    assert "PATH_NOT_FOUND" not in str(ei.value)


def test_resume_absent_lineage_full_run(spark, pages_df, tmp_path):
    extracted, _ = run_extraction(
        spark, pages_df, lineage_path=str(tmp_path / "never_written"), num_buckets=8
    )
    assert extracted.count() == N


def test_crash_between_appends_leaves_no_duplicates(spark, pages_df, tmp_path):
    """ADVICE r1: output append succeeded, lineage append lost (crash
    window) → the committed read must hide the orphan rows and a re-run
    must restore exactly-once output."""
    from pyspark.sql import functions as F

    from contentextractor_spark.plans.pipeline import read_committed_output

    out_path, lin_path = str(tmp_path / "out"), str(tmp_path / "lineage")
    # simulate the dying first run: write output WITH a run_id, no lineage
    orphan = extract_pages(pages_df, num_buckets=8).withColumn(
        "run_id", F.lit("deadrun")
    )
    orphan.write.mode("append").partitionBy("bucket_id").parquet(out_path)

    # recovery run: resume sees no lineage → full run, appends everything
    extracted, lineage = run_extraction(
        spark, pages_df, output_path=out_path, lineage_path=lin_path, num_buckets=8
    )
    assert spark.read.parquet(out_path).count() == 2 * N  # orphans on disk
    committed = read_committed_output(spark, out_path, lin_path)
    assert committed.count() == N  # but invisible to readers
    assert extracted.count() == N
    assert committed.filter("run_id = 'deadrun'").count() == 0
    assert sum(r.row_count for r in lineage.collect()) == N
