"""Structured Streaming parity + stateful-operator tests."""

import os

import pytest

from contentextractor_spark.plans.pipeline import PAGES_SCHEMA, extract_pages
from contentextractor_spark.sources.pages import generate_pages
from contentextractor_spark.streaming.stream import (
    read_pages_stream,
    running_user_stats,
    stream_extract,
    windowed_event_counts,
    write_stream,
)

N = 60


def test_stream_extract_matches_batch(spark, tmp_path):
    pdf = generate_pages(N, seed=42)
    batch_df = spark.createDataFrame(pdf, schema=PAGES_SCHEMA)

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    # land the pages as two parquet files (two micro-batch candidates)
    batch_df.repartition(2).write.parquet(in_dir)

    stream = read_pages_stream(spark, in_dir, max_files_per_trigger=1)
    assert stream.isStreaming
    q = write_stream(stream_extract(stream, num_buckets=8), out_dir, ckpt)
    q.awaitTermination(120)

    got = {r.url: r.main_text for r in spark.read.parquet(out_dir).collect()}
    want = {
        r.url: r.main_text for r in extract_pages(batch_df, num_buckets=8).collect()
    }
    assert got == want  # streaming == batch, byte-identical per url

    # restart with same checkpoint: no new data → no duplicate rows
    q2 = write_stream(stream_extract(read_pages_stream(spark, in_dir), 8), out_dir, ckpt)
    q2.awaitTermination(60)
    assert spark.read.parquet(out_dir).count() == N


def test_stream_extract_links_matches_batch(spark, tmp_path):
    from contentextractor_spark.plans.pipeline import extract_links
    from contentextractor_spark.streaming.stream import stream_extract_links

    pdf = generate_pages(40, seed=7)
    batch_df = spark.createDataFrame(pdf, schema=PAGES_SCHEMA)
    in_dir = str(tmp_path / "lin")
    batch_df.repartition(2).write.parquet(in_dir)

    stream = read_pages_stream(spark, in_dir, max_files_per_trigger=1)
    q = (
        stream_extract_links(stream, num_buckets=8)
        .writeStream.format("memory")
        .queryName("links_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "links stream did not finish in 120 s"
    got = {
        (r.url, r.link_idx, r.href)
        for r in spark.sql("SELECT * FROM links_stream").collect()
    }
    want = {
        (r.url, r.link_idx, r.href)
        for r in extract_links(batch_df, num_buckets=8).collect()
    }
    assert want, "fixture pages produced no links — parity check weakened"
    assert got == want  # streaming == batch link rows


def test_windowed_event_counts(spark, tmp_path):
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    in_dir = str(tmp_path / "ev")
    events.write.parquet(in_dir)
    stream = (
        spark.readStream.schema(events.schema).parquet(in_dir)
    )
    agg = windowed_event_counts(stream)
    q = (
        agg.writeStream.format("memory")
        .queryName("wincounts")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # append mode only emits windows the watermark has passed; compare the
    # closed ones against the batch computation
    got = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value_c)
        for r in spark.sql("select * from wincounts").collect()
    }
    from pyspark.sql import functions as F

    want_df = (
        events.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("s"),
        )
        .select(F.col("window.start").alias("ws"), "event_type", "n", "s")
    )
    want = {(r.ws, r.event_type): (r.n, r.s) for r in want_df.collect()}
    assert set(got) <= set(want)
    for k, v in got.items():
        assert want[k] == v
    assert len(got) > 0


def test_running_user_stats_stateful(spark, tmp_path):
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    in_dir = str(tmp_path / "ev2")
    events.write.parquet(in_dir)
    stream = spark.readStream.schema(events.schema).parquet(in_dir)
    q = (
        running_user_stats(stream)
        .writeStream.format("memory")
        .queryName("userstats")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql(
        "select user_id, max(n_events_total) as n from userstats group by user_id"
    ).collect()
    got = {r.user_id: r.n for r in rows}
    want = {
        r.user_id: r.n
        for r in events.groupBy("user_id").count().withColumnRenamed("count", "n").collect()
    }
    assert got == want


def test_session_fn_nat_never_poisons_last_ts():
    """r3 review: an all-null-ts chunk made last_ts = NaT, and 'mx > NaT'
    is always False — real timestamps were locked out forever."""
    import pandas as pd

    from contentextractor_spark.streaming.stream import _session_fn

    class FakeState:
        exists = False

        def update(self, v):
            self.value = v

    t = pd.Timestamp("2024-01-01 12:00:00")
    chunks = [
        pd.DataFrame({"ts": pd.to_datetime([None, None])}),  # NaT-only first
        pd.DataFrame({"ts": [t, t - pd.Timedelta(minutes=5)]}),
    ]
    state = FakeState()
    out = list(_session_fn((7,), iter(chunks), state))
    assert state.value == (4, t)
    assert out[0]["last_ts"][0] == t

    # NaT persisted by an older run must also be displaced, not sticky
    class FakeState2(FakeState):
        exists = True
        get = (2, pd.NaT)

    state2 = FakeState2()
    list(_session_fn((7,), iter([chunks[1]]), state2))
    assert state2.value == (4, t)


def test_streaming_dedup_within_watermark(spark, tmp_path):
    from contentextractor_spark.streaming.stream import dedup_events_stream

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet").limit(500)
    in_dir, out_dir, ckpt = (str(tmp_path / d) for d in ("in", "out", "ck"))
    # duplicated ingest: every event arrives twice
    events.write.mode("append").parquet(in_dir)
    events.write.mode("append").parquet(in_dir)
    stream = spark.readStream.schema(events.schema).parquet(in_dir)
    q = (
        dedup_events_stream(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out_dir)
    assert got.count() == 500
    assert got.select("event_id").distinct().count() == 500


def test_stateless_curation_ops_run_on_streams(spark, tmp_path):
    """pii_scrub and train_split_assign are stateless narrow projections —
    they must run UNCHANGED on a streaming DataFrame and agree with the
    batch result (the contract that lets the curation pipeline move to a
    readStream ingest without rewrites)."""
    from contentextractor_spark.functions.analysis import (
        pii_scrub,
        train_split_assign,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(50)
    in_dir = str(tmp_path / "docs")
    docs.write.parquet(in_dir)
    stream = spark.readStream.schema(docs.schema).parquet(in_dir)

    q = (
        pii_scrub(stream)
        .writeStream.format("memory")
        .queryName("pii_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "pii stream did not finish in 120 s"
    got = {
        r.doc_id: r.clean_text for r in spark.sql("SELECT * FROM pii_stream").collect()
    }
    want = {r.doc_id: r.clean_text for r in pii_scrub(spark.read.parquet(in_dir)).collect()}
    assert got == want

    q2 = (
        train_split_assign(stream)
        .writeStream.format("memory")
        .queryName("split_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q2.awaitTermination(120), "split stream did not finish in 120 s"
    got2 = {
        r.doc_id: r.split for r in spark.sql("SELECT * FROM split_stream").collect()
    }
    want2 = {
        r.doc_id: r.split
        for r in train_split_assign(spark.read.parquet(in_dir)).collect()
    }
    assert got2 == want2

    # quality_filter is row-level integer arithmetic — same contract
    from contentextractor_spark.functions.analysis import quality_filter

    q3 = (
        quality_filter(stream)
        .writeStream.format("memory")
        .queryName("qf_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q3.awaitTermination(120), "quality stream did not finish in 120 s"
    got3 = {
        (r.doc_id, r.violations, r.keep)
        for r in spark.sql("SELECT * FROM qf_stream").collect()
    }
    want3 = {
        (r.doc_id, r.violations, r.keep)
        for r in quality_filter(spark.read.parquet(in_dir)).collect()
    }
    assert got3 == want3


def test_stream_sketches_match_batch(spark, tmp_path):
    """r4: the sketch aggregations are their own streaming merge operators
    — HLL registers and the CMS counter table computed over a 2-file
    stream (complete mode, bounded state) must equal the batch sketch on
    the same rows."""
    from contentextractor_spark.functions import analysis as A
    from contentextractor_spark.streaming.stream import (
        stream_cms_sketch,
        stream_hll_registers,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(60)
    in_dir = str(tmp_path / "docs")
    docs.repartition(2).write.parquet(in_dir)  # two micro-batch candidates
    batch = spark.read.parquet(in_dir)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )

    q = (
        stream_hll_registers(stream, p=8, n=3)
        .writeStream.format("memory")
        .queryName("hll_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "hll stream did not finish"
    got = {
        (r.register, r.max_rho)
        for r in spark.sql("SELECT * FROM hll_stream").collect()
    }
    want = {
        (r.register, r.max_rho)
        for r in A.hll_registers(batch, p=8, n=3).collect()
    }
    assert got == want
    assert len(got) <= 256  # bounded state: never more than m rows

    q2 = (
        stream_cms_sketch(stream, n=1, d=4, w=64)
        .writeStream.format("memory")
        .queryName("cms_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    assert q2.awaitTermination(120), "cms stream did not finish"
    got2 = {
        (r.row, r.col, r.cnt)
        for r in spark.sql("SELECT * FROM cms_stream").collect()
    }
    want2 = {
        (r.row, r.col, r.cnt)
        for r in A.cms_sketch(batch, n=1, d=4, w=64).collect()
    }
    assert got2 == want2
    assert len(got2) <= 4 * 64


def test_stream_latest_snapshot_matches_batch(spark, tmp_path):
    """r5: the packed-bigint argmax is its own streaming merge — the
    newest-snapshot winner over a 2-file stream (complete mode, one long
    of state per key) must equal the batch latest_snapshot on the same
    rows, including the ts-tie -> max-id break."""
    from contentextractor_spark.functions import analysis as A
    from contentextractor_spark.streaming.stream import stream_latest_snapshot

    snaps = spark.createDataFrame(
        [("u1", 0, 100), ("u1", 1, 300), ("u1", 2, 200),
         ("u2", 3, 50), ("u2", 4, 50), ("u3", 9, 0)],
        "url string, doc_id bigint, ts bigint",
    )
    in_dir = str(tmp_path / "snaps")
    snaps.repartition(2).write.parquet(in_dir)
    batch = spark.read.parquet(in_dir)
    stream = (
        spark.readStream.schema(snaps.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = (
        stream_latest_snapshot(stream)
        .writeStream.format("memory")
        .queryName("latest_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "latest stream did not finish"
    got = {
        (r.key, r.doc_id, r.ts)
        for r in spark.sql("SELECT * FROM latest_stream").collect()
    }
    want = {(r.key, r.doc_id, r.ts) for r in A.latest_snapshot(batch).collect()}
    assert got == want == {("u1", 1, 300), ("u2", 4, 50), ("u3", 9, 0)}


def test_stream_extract_headings_matches_batch(spark, tmp_path):
    from contentextractor_spark.plans.pipeline import extract_headings
    from contentextractor_spark.streaming.stream import stream_extract_headings

    rows = []
    for i in range(10):
        html = (
            "<html><body><h1>T%d</h1><h2>a</h2>" % i
            + ("<h3>deep</h3>" if i % 2 == 0 else "")
            + "<h2>b</h2></body></html>"
        ).encode()
        rows.append((f"u{i}", html))
    rows.append(("bad", b"\xff\xfe not html"))
    batch_df = spark.createDataFrame(rows, "url string, html binary")
    in_dir = str(tmp_path / "hin")
    batch_df.repartition(2).write.parquet(in_dir)

    stream = read_pages_stream(spark, in_dir, max_files_per_trigger=1)
    q = (
        stream_extract_headings(stream, num_buckets=8)
        .writeStream.format("memory")
        .queryName("headings_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "headings stream did not finish in 120 s"
    key = lambda r: (r.url, r.h_idx, r.level, r.sec, r.text)  # noqa: E731
    got = {key(r) for r in spark.sql("SELECT * FROM headings_stream").collect()}
    want = {key(r) for r in extract_headings(batch_df, num_buckets=8).collect()}
    assert want, "fixture pages produced no heading rows"
    assert got == want  # streaming == batch outline rows


def test_stream_extract_tables_matches_batch(spark, tmp_path):
    from contentextractor_spark.plans.pipeline import extract_tables
    from contentextractor_spark.streaming.stream import stream_extract_tables

    rows = []
    for i in range(12):
        html = (
            "<html><body><table><tr><th>k%d</th></tr>"
            "<tr><td>v%d</td></tr></table>" % (i, i)
            + ("<table><tr><td>x%d</td></tr></table>" % i if i % 3 == 0 else "")
            + "</body></html>"
        ).encode()
        rows.append((f"u{i}", html))
    rows.append(("bad", b"\xff\xfe not html"))
    batch_df = spark.createDataFrame(rows, "url string, html binary")
    in_dir = str(tmp_path / "tin")
    batch_df.repartition(2).write.parquet(in_dir)

    stream = read_pages_stream(spark, in_dir, max_files_per_trigger=1)
    q = (
        stream_extract_tables(stream, num_buckets=8)
        .writeStream.format("memory")
        .queryName("tables_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "tables stream did not finish in 120 s"
    key = lambda r: (r.url, r.table_idx, r.row_idx, r.col_idx, r.is_header, r.cell)  # noqa: E731
    got = {key(r) for r in spark.sql("SELECT * FROM tables_stream").collect()}
    want = {key(r) for r in extract_tables(batch_df, num_buckets=8).collect()}
    assert want, "fixture pages produced no table cells"
    assert got == want  # streaming == batch cell rows


def test_stream_dataset_digest_matches_batch(spark, tmp_path):
    """r5 s4: the (count, hash-sum) digest cell is a commutative monoid —
    the streaming digest over a 2-file stream (complete mode, bounded
    state: groups x shards rows) must equal the batch dataset_digest on
    the same rows."""
    from contentextractor_spark.functions import analysis as A
    from contentextractor_spark.streaming.stream import stream_dataset_digest

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).limit(80)
    in_dir = str(tmp_path / "docs")
    docs.repartition(2).write.parquet(in_dir)
    batch = spark.read.parquet(in_dir)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = (
        stream_dataset_digest(stream, n_shards=4)
        .writeStream.format("memory")
        .queryName("digest_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "digest stream did not finish"
    got = {
        (r.grp, r.shard, r.n_rows, r.content_sum)
        for r in spark.sql("SELECT * FROM digest_stream").collect()
    }
    want = {
        (r.grp, r.shard, r.n_rows, r.content_sum)
        for r in A.dataset_digest(batch, n_shards=4).collect()
    }
    assert got == want


def test_stream_parse_feeds_matches_batch(spark, tmp_path):
    """r5 s4: feed ingestion shares the batch flat-map — the streaming
    rows over a 2-file stream must equal parse_feeds on the same rows."""
    from contentextractor_spark.plans.pipeline import parse_feeds
    from contentextractor_spark.streaming.stream import stream_parse_feeds

    rows = [
        (
            f"h{i}.example",
            (
                "<rss><channel>"
                + f"<item><title>t{i}</title><link>https://h{i}/x</link></item>"
                + "</channel></rss>"
                if i % 2 == 0
                else "<feed>"
                + f'<entry><title>a{i}</title><link href="https://h{i}/y"/></entry>'
                + "</feed>"
            ),
        )
        for i in range(12)
    ]
    feeds = spark.createDataFrame(rows, "host string, xml string")
    in_dir = str(tmp_path / "feeds")
    feeds.repartition(2).write.parquet(in_dir)
    batch = spark.read.parquet(in_dir)
    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = (
        stream_parse_feeds(stream)
        .writeStream.format("memory")
        .queryName("feeds_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "feed stream did not finish"
    got = {
        tuple(r)
        for r in spark.sql("SELECT * FROM feeds_stream").collect()
    }
    want = {tuple(r) for r in parse_feeds(batch).collect()}
    assert got == want and len(want) == 12


def test_stream_weighted_sample_matches_batch(spark, tmp_path):
    """r5 s5: the sampling decision is a pure row-local function, so the
    streaming twin (append mode, zero state) must keep EXACTLY the batch
    sample on the same rows."""
    from contentextractor_spark.functions import analysis as A
    from contentextractor_spark.streaming.stream import stream_weighted_sample

    docs = spark.createDataFrame(
        [(i, (i * 37) % 400) for i in range(300)],
        "doc_id bigint, n_chars bigint",
    )
    in_dir = str(tmp_path / "wsdocs")
    docs.repartition(3).write.parquet(in_dir)
    batch = spark.read.parquet(in_dir)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = (
        stream_weighted_sample(stream)
        .writeStream.format("memory")
        .queryName("ws_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "weighted-sample stream did not finish"
    rows = spark.sql("SELECT * FROM ws_stream").collect()
    # the twin keeps payload columns (project=False) so the next stage
    # can consume the sampled rows without joining back to the source
    assert set(rows[0].asDict()) == {"doc_id", "n_chars", "w"}
    got = {(r.doc_id, r.w) for r in rows}
    want = {(r.doc_id, r.w) for r in A.weighted_sample(batch).collect()}
    assert got == want and 0 < len(want) < 300


def test_stream_extract_lists_matches_batch(spark, tmp_path):
    from contentextractor_spark.plans.pipeline import extract_lists
    from contentextractor_spark.streaming.stream import stream_extract_lists

    rows = []
    for i in range(12):
        html = (
            "<html><body><ul><li>a%d</li><li>b</li></ul>" % i
            + ("<ol><li>o%d</li></ol>" % i if i % 3 == 0 else "")
            + "</body></html>"
        ).encode()
        rows.append((f"u{i}", html))
    rows.append(("bad", b"\xff\xfe not html"))
    batch_df = spark.createDataFrame(rows, "url string, html binary")
    in_dir = str(tmp_path / "lin")
    batch_df.repartition(2).write.parquet(in_dir)

    stream = read_pages_stream(spark, in_dir, max_files_per_trigger=1)
    q = (
        stream_extract_lists(stream, num_buckets=8)
        .writeStream.format("memory")
        .queryName("lists_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "lists stream did not finish in 120 s"
    key = lambda r: (r.url, r.list_idx, r.list_type, r.item_idx, r.item)  # noqa: E731
    got = {key(r) for r in spark.sql("SELECT * FROM lists_stream").collect()}
    want = {key(r) for r in extract_lists(batch_df, num_buckets=8).collect()}
    assert want, "fixture pages produced no list items"
    assert got == want  # streaming == batch item rows


def test_stream_quality_means_matches_batch(spark, tmp_path):
    """r5 s10: quality_drift's first stage is a (sum, count) monoid —
    the streaming means over a 2-file stream (complete mode) must equal
    the batch stage on the same rows."""
    from contentextractor_spark.functions.analysis import (
        _quality_batch_means,
    )
    from contentextractor_spark.streaming.stream import (
        stream_quality_means,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).limit(80)
    in_dir = str(tmp_path / "docs")
    docs.repartition(2).write.parquet(in_dir)
    batch = spark.read.parquet(in_dir)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = (
        stream_quality_means(stream, batch=40)
        .writeStream.format("memory")
        .queryName("qmeans_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "quality-means stream did not finish"
    got = {
        (r.source, r.b, r.mean_permille)
        for r in spark.sql("SELECT * FROM qmeans_stream").collect()
    }
    want = {
        (r.source, r.b, r.mean_permille)
        for r in _quality_batch_means(batch, 40).collect()
    }
    assert got == want


def test_stream_dp_release_matches_batch(spark, tmp_path):
    """r5 s14: the DP count release streams — count merges, the noise
    projection depends only on the group key, so the 2-file stream's
    final card equals the batch release on the same rows."""
    from contentextractor_spark.functions import analysis as A
    from contentextractor_spark.streaming.stream import stream_dp_release

    docs = spark.createDataFrame(
        [(i, "t", f"s{i % 3}") for i in range(30)],
        "doc_id bigint, text string, source string",
    )
    in_dir = str(tmp_path / "dpdocs")
    docs.repartition(2).write.parquet(in_dir)
    batch = spark.read.parquet(in_dir)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = (
        stream_dp_release(stream)
        .writeStream.format("memory")
        .queryName("dp_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "dp stream did not finish"
    got = {tuple(r) for r in spark.sql("SELECT * FROM dp_stream").collect()}
    want = {tuple(r) for r in A.dp_release(batch).collect()}
    assert got == want and len(got) == 3
