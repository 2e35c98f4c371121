#!/usr/bin/env python3
"""Controlled per-query measurement harness for optimization work (guide
§1.1/§1.4): runs a SELECTED set of registry queries in ONE warm session,
several samples each, through the noop sink, with labeled jobs — the
controlled breakdown CLAUDE.md mandates for plan decisions (one-shot
bench.py samples misorder A/Bs by 2-3x under host bursts).

This file is NOT the frozen driver bench (bench.py is the measured
artifact); it exists so optimization evidence in OPTIMIZATION_r06.md has
honest repeated-sample numbers and committed .explain("formatted") plans.

Usage:
  python bench_extra.py q1,q2,...      # 3 samples each, prints JSON
  SPARK_GRAFT_EXPLAIN_DIR=plans/r06 SPARK_GRAFT_EXPLAIN_SUFFIX=before \
    python bench_extra.py q1,q2        # additionally dumps <q>_before.txt
  SPARK_GRAFT_SAMPLES=5 python bench_extra.py q1

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from contentextractor_spark.plans.pipeline import build_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SAMPLES = int(os.environ.get("SPARK_GRAFT_SAMPLES", "3"))
EXPLAIN_DIR = os.environ.get("SPARK_GRAFT_EXPLAIN_DIR", "")
EXPLAIN_SUFFIX = os.environ.get("SPARK_GRAFT_EXPLAIN_SUFFIX", "before")


def main() -> None:
    names = [n for n in (sys.argv[1] if len(sys.argv) > 1 else "").split(",") if n]
    if not names:
        print("usage: bench_extra.py q1,q2,...", file=sys.stderr)
        sys.exit(2)
    spark = build_spark(
        app=f"cx-bench-extra-{CPUS}",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(CPUS, 16),
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import functions as F

    from __spark_entry__ import queries as entry_queries
    from contentextractor_spark.functions import analysis as A

    qs = entry_queries()
    # warm scans + Python workers once (steady-state, not cold-start)
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    docs.count(), emb.count()

    # bench.py configurations for the rows it calls DIRECTLY (not via the
    # entry registry) — replicated here so A/B numbers measure the same
    # workload the frozen bench times
    _prefix_memo: list = []

    def _prefix_input():
        if not _prefix_memo:
            _prefix_memo.append(
                A.shingles(docs, n=3)
                .groupBy("doc_id")
                .agg(
                    F.concat_ws(
                        " ",
                        F.collect_list(F.regexp_replace("shingle", " ", "_")),
                    ).alias("text")
                )
                .localCheckpoint()
            )
        return _prefix_memo[0]

    direct = {
        "pq_topk": lambda s, d: A.pq_topk(
            emb, n_queries=10, k=5, m=16, n_centroids=64, iters=2, shortlist=50
        ),
        "ivfpq_topk": lambda s, d: A.ivfpq_topk(emb),
        "quantized_knn": lambda s, d: A.quantized_knn(emb, n_queries=10, k=5),
        "kmeans_clusters": lambda s, d: A.kmeans_clusters(emb, k=8, iters=2),
        "embedding_neardup_lsh": lambda s, d: A.embedding_neardup_lsh(
            emb, threshold=0.35, n_bands=6, band_bits=3
        ),
        "dedup_components_simhash": lambda s, d: A.dedup_components_simhash(
            docs, bits=48, n_bands=4, max_bucket_size=100
        ),
        "simhash_neardup_pairs": lambda s, d: A.simhash_neardup_pairs(
            docs, bits=48, n_bands=4, max_bucket_size=100
        ),
        "substring_scrub": lambda s, d: A.substring_scrub(docs, k=4, min_grams=2),
    }
    qs.update(direct)

    # rows whose producers persist internals: collect the handles so each
    # sample unpersists after timing (bench.py's _run_jaccard discipline —
    # otherwise sample 2 times a partly-cached plan)
    handles: list = []
    qs["jaccard_prefix_pairs"] = lambda s, d: A.jaccard_prefix_pairs(
        _prefix_input(), (3, 5), max_prefix_df=100, cache_handle=handles
    )
    qs["ngram_jaccard_pairs"] = lambda s, d: A.jaccard_pairs(
        docs, cache_handle=handles
    )
    qs["containment_pairs"] = lambda s, d: A.containment_pairs(
        docs, cache_handle=handles
    )

    out: dict[str, list[float]] = {}
    for name in names:
        fn = qs[name]
        samples = []
        for i in range(SAMPLES):
            spark.sparkContext.setJobDescription(f"{name} sample {i}")
            t0 = time.time()
            df = fn(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            samples.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
            for h in handles:
                h.unpersist()
            handles.clear()
        out[name] = samples
        if EXPLAIN_DIR:
            os.makedirs(EXPLAIN_DIR, exist_ok=True)
            buf = io.StringIO()
            with redirect_stdout(buf):
                fn(spark, SF_DIR).explain("formatted")
            with open(
                os.path.join(EXPLAIN_DIR, f"{name}_{EXPLAIN_SUFFIX}.txt"), "w"
            ) as f:
                f.write(buf.getvalue())
        print(json.dumps({name: samples}), flush=True)
    print(json.dumps({"sf_dir": SF_DIR, "cpus": CPUS, "samples": out}))


if __name__ == "__main__":
    main()
