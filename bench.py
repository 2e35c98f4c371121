#!/usr/bin/env python3
"""Benchmark harness — prints ONE JSON line.

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": <sf>,
     "docs_per_sec": <flagship extraction throughput>, ...}

Env:
  SPARK_GRAFT_SF_DIR   input dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     local[<n>] parallelism (default 32)
  SPARK_GRAFT_BENCH_ONLY  comma list of query names to run (default: all)

The flagship metric is documents/sec of the end-to-end extraction stage
(decode → DOM → tagFiltering → text-density) over a deterministic synthetic
Common-Crawl-style pages table sized 200k×sf rows (cached parquet, seed 42).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from contentextractor_spark.functions import analysis as A  # noqa: E402
from contentextractor_spark.functions import events as E  # noqa: E402
from contentextractor_spark.functions import relational as R  # noqa: E402
from contentextractor_spark.plans.pipeline import build_spark, extract_pages  # noqa: E402
from contentextractor_spark.sources.pages import write_pages_parquet  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_bench_cache")
NUM_BUCKETS = int(os.environ.get("SPARK_GRAFT_NUM_BUCKETS", "64"))  # fixed across parallelism levels → identical job for scaling


def sf_of(path: str) -> float:
    m = re.search(r"sf([0-9.]+)", path)
    return float(m.group(1)) if m else 0.1


def pages_parquet(n: int) -> str:
    os.makedirs(CACHE_DIR, exist_ok=True)
    path = os.path.join(CACHE_DIR, f"pages_{n}_v2")
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):  # absent or partially-written → regenerate
        import shutil

        shutil.rmtree(path, ignore_errors=True)
        write_pages_parquet(path, n, seed=42, n_files=32)
        open(marker, "w").close()
    return path


def main() -> None:
    sf = sf_of(SF_DIR)
    n_pages = int(os.environ.get("SPARK_GRAFT_N_PAGES", "0")) or max(
        200, int(200_000 * sf)
    )
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY", "")
    selected = set(only.split(",")) if only else None

    spark = build_spark(
        app=f"cx-bench-{CPUS}",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(CPUS, 16),
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    pages = spark.read.parquet(pages_parquet(n_pages))
    docs.count(), emb.count(), pages.count()  # warm the scan / JVM
    # warm the Python workers (imports + Arrow init) — we measure
    # steady-state throughput, not process cold-start
    extract_pages(pages.limit(64 * CPUS), num_buckets=NUM_BUCKETS).count()

    def docs_as_pages():
        # same eligibility gate as __spark_entry__._eligible (kept alphabet)
        keep_neg = "[^a-zA-Z0-9_０-９Ａ-Ｚａ-ｚ一-鿿぀-ゟ゠-ヿ]"
        eligible = docs.filter(
            (F.length(F.regexp_replace("text", keep_neg, "")) >= 18)
            & ~F.col("text").rlike("(記事一覧|利用規約|Copyright)")
        )
        return eligible.select(
            F.col("doc_id").cast("string").alias("url"),
            F.encode(
                F.concat(
                    F.lit("<html><body><div><p>"),
                    F.col("text"),
                    F.lit("</p></div></body></html>"),
                ),
                "UTF-8",
            ).alias("html"),
        )

    def force(df):
        """Full evaluation: .count() lets Catalyst prune columns and skip
        the very expressions being benchmarked (narrow projections would
        time the bare scan); the noop sink materializes every column."""
        df.write.format("noop").mode("overwrite").save()

    def _run_jaccard():
        # unpersist the shingle cache after timing — otherwise it stays
        # pinned while every later query is measured (r3 review finding)
        handle: list = []
        force(A.jaccard_pairs(docs, cache_handle=handle))
        for df in handle:
            df.unpersist()

    bench_queries = {
        "extract_pages": lambda: force(extract_pages(pages, num_buckets=NUM_BUCKETS)),
        "extract_roundtrip": lambda: force(
            extract_pages(docs_as_pages(), num_buckets=NUM_BUCKETS)
        ),
        "dedup_exact": lambda: force(A.dedup_exact(docs)),
        "minhash_signatures": lambda: force(A.minhash_signatures(docs, k=4, n=3)),
        "ngram_jaccard_pairs": lambda: _run_jaccard(),
        "simhash": lambda: force(A.simhash(docs, bits=48)),
        "knn_bruteforce": lambda: force(A.knn_bruteforce(emb, n_queries=10, k=5)),
        "embedding_neardup_lsh": lambda: force(
            A.embedding_neardup_lsh(emb, threshold=0.35, n_bands=6, band_bits=3)
        ),
        "token_counts": lambda: force(A.token_counts(docs)),
        "rolling_fingerprints": lambda: force(A.rolling_fingerprints(docs)),
        "lang_id": lambda: force(A.lang_id(docs)),
        "quality_scores": lambda: force(A.quality_scores(docs)),
        "tpch_region_revenue": lambda: force(R.region_revenue(
            *(spark.read.parquet(os.path.join(SF_DIR, f"{t}.parquet"))
              for t in ("lineitem", "orders", "customer", "nation", "region"))
        )),
        "events_sessionize": lambda: force(E.sessionize(
            spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
        )),
        # r3 curation ops
        "repetition_signals": lambda: force(A.repetition_signals(docs)),
        "chunk_hash_dedup": lambda: force(
            A.chunk_hash_dedup(docs, chunk_tokens=32, overlap=0)
        ),
        "pii_scrub": lambda: force(A.pii_scrub(docs)),
        "decontaminate": lambda: force(
            A.decontaminate(docs, docs.filter(F.col("doc_id") < 20))
        ),
        "winnowing_fingerprints": lambda: force(
            A.winnowing_fingerprints(docs, k=3, w=4)
        ),
        "pack_sequences": lambda: force(
            A.pack_sequences(docs, capacity=256, n_groups=32)
        ),
        "pdf_extract": lambda: force(_pdf_extract()),
        "simhash_neardup_pairs": lambda: force(
            A.simhash_neardup_pairs(docs, bits=48, n_bands=4, max_bucket_size=100)
        ),
        "incremental_dedup": lambda: force(
            A.incremental_dedup(
                docs.filter(F.col("doc_id") % 2 == 0),
                docs.filter(F.col("doc_id") % 2 == 1),
            )
        ),
        "extract_links": lambda: force(_extract_links()),
        "pagerank": lambda: force(_pagerank()),
        "quantized_knn": lambda: force(A.quantized_knn(emb, n_queries=10, k=5)),
        "tfidf_top_terms": lambda: force(A.tfidf_top_terms(docs, k=5)),
        "quality_filter": lambda: force(A.quality_filter(docs)),
        "unigram_surprisal": lambda: force(A.unigram_surprisal(docs)),
        "bm25_search": lambda: force(
            A.bm25_search(docs, ["query", "scan", "window"], k=15)
        ),
        "inverted_index": lambda: force(
            A.inverted_index(docs, min_df=2, max_postings=8)
        ),
        "dedup_components_simhash": lambda: force(
            A.dedup_components_simhash(docs, bits=48, n_bands=4, max_bucket_size=100)
        ),
        # r4: fifth dedup family — scrub subsumes the span producer
        "substring_scrub": lambda: force(
            A.substring_scrub(docs, k=4, min_grams=2)
        ),
    }

    def _extract_links():
        from contentextractor_spark.plans.pipeline import extract_links

        return extract_links(pages, num_buckets=NUM_BUCKETS)

    def _pagerank():
        # the SAME graph the driver row checks (shared constructor — a
        # drifting copy would bench a different workload), 3 rounds
        from __spark_entry__ import pagerank_edges_sql

        return A.pagerank(pagerank_edges_sql(docs), iters=3)

    def _pdf_extract():
        # PDF/layout path: SQL-built honest PDFs (reverse-stream layout)
        # through the stdlib parser — same shape as the driver oracle row
        from __spark_entry__ import _PDF_SAFE_RE, _pdf_pages_sql

        from contentextractor_spark.plans.pipeline import extract_pdf_pages

        pdocs = docs.filter(F.col("text").rlike(_PDF_SAFE_RE))
        return extract_pdf_pages(_pdf_pages_sql(pdocs), num_buckets=NUM_BUCKETS)

    times: dict[str, float] = {}
    for name, fn in bench_queries.items():
        if selected is not None and name not in selected:
            continue
        t0 = time.time()
        fn()
        times[name] = round(time.time() - t0, 3)

    extract_sec = times.get("extract_pages")
    docs_per_sec = round(n_pages / extract_sec, 1) if extract_sec else None
    out = {
        "metric": "end-to-end extraction + corpus-ops wall time",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "sf": sf,
        "docs_per_sec": docs_per_sec,
        "n_pages": n_pages,
        "cpus": CPUS,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
