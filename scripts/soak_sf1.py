"""sf1 sustained-scale soak for the dedup chain (VERDICT r4 #6).

The 100 TB claims for the near-dup families were plan-shape arguments
verified at sf0.1 (5k docs / 2k embeddings).  This soak runs the three
pair producers + large-star/small-star end-to-end at 40x that scale —
200,000 documents / 80,000 embeddings — on local[32] with the DRIVER
ROWS' caps active, to confirm (a) cap behavior under far denser buckets,
(b) memory headroom under the 16g-driver invariant, (c) wall clock.
A 200k-page extraction run (the literal "sf1 pages" reading) closes it.

Input synthesis is deterministic: 40 copies of the sf0.1 tables, ids
offset by copy*10^7; copies with copy%4==0 keep text/embedding IDENTICAL
to copy 0 (mass near-dup density — 10 exact copies of every doc), the
rest get a copy-specific leading token / a +copy/100 first-component
shift.  No randomness, no external data.

Run:  python scripts/soak_sf1.py          (~10 min; writes _soak_sf1/)
Results are appended by hand to BENCH/BASELINE.md (the soak section).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from contentextractor_spark.functions import analysis as A  # noqa: E402
from contentextractor_spark.plans.pipeline import (  # noqa: E402
    build_spark,
    extract_pages,
)

BASE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "_soak_sf1")
SF01 = "/root/testdata/sf0.1"
COPIES = 40
OFF = 10_000_000


def _materialize(spark):
    """Write the 40x documents/embeddings tables once (marker-gated)."""
    docs_p = os.path.join(BASE, "documents")
    emb_p = os.path.join(BASE, "embeddings")
    if not os.path.exists(os.path.join(docs_p, "_SUCCESS_SOAK")):
        docs = spark.read.parquet(os.path.join(SF01, "documents.parquet"))
        copies = spark.range(COPIES).select(F.col("id").alias("copy"))
        big = (
            docs.crossJoin(F.broadcast(copies))
            .select(
                (F.col("copy") * OFF + F.col("doc_id")).alias("doc_id"),
                F.when(F.col("copy") % 4 == 0, F.col("text"))
                .otherwise(F.concat(F.lit("c"), F.col("copy").cast("string"),
                                    F.lit(" "), F.col("text")))
                .alias("text"),
                "lang",
                "n_chars",
            )
        )
        big.repartition(64).write.mode("overwrite").parquet(docs_p)
        open(os.path.join(docs_p, "_SUCCESS_SOAK"), "w").close()
    if not os.path.exists(os.path.join(emb_p, "_SUCCESS_SOAK")):
        emb = spark.read.parquet(os.path.join(SF01, "embeddings.parquet"))
        copies = spark.range(COPIES).select(F.col("id").alias("copy"))
        big = (
            emb.crossJoin(F.broadcast(copies))
            .select(
                (F.col("copy") * OFF + F.col("vec_id")).alias("vec_id"),
                F.when(F.col("copy") % 4 == 0, F.col("embedding"))
                .otherwise(
                    F.concat(
                        F.array(
                            (
                                F.element_at("embedding", 1)
                                + F.col("copy") / F.lit(100.0)
                            ).cast("float")
                        ),
                        F.slice("embedding", 2, F.size("embedding") - 1),
                    )
                )
                .alias("embedding"),
                "label",
            )
        )
        big.repartition(32).write.mode("overwrite").parquet(emb_p)
        open(os.path.join(emb_p, "_SUCCESS_SOAK"), "w").close()
    return (spark.read.parquet(docs_p), spark.read.parquet(emb_p))


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(label, fn):
    t0 = time.time()
    extra = fn()
    wall = round(time.time() - t0, 2)
    row = {"family": label, "wall_s": wall}
    if extra:
        row.update(extra)
    print(json.dumps(row), flush=True)
    return row


def main():
    spark = build_spark(app="cx-soak-sf1", master="local[32]",
                        shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    docs, emb = _materialize(spark)
    n_docs, n_emb = docs.count(), emb.count()
    print(json.dumps({"n_docs": n_docs, "n_emb": n_emb}), flush=True)

    rows = []
    # family 1: MinHash banding -> star edges -> LSS (driver-row params;
    # cap 2 is the sf0.01 driver row's — at this density it drops nearly
    # every bucket, which is exactly the cap doing its job loudly, so the
    # soak ALSO runs the uncapped star-edge path (linear edges by design))
    rows.append(timed("minhash_overflow_cap2", lambda: {
        "overflow_buckets": A.minhash_lsh_overflow(
            docs, k=4, n=3, max_bucket_size=2).count()}))
    rows.append(timed("dedup_components_minhash_uncapped", lambda: (
        noop(A.dedup_components_minhash(docs, k=4, n=3)))))

    # family 2: SimHash banded pairs + LSS (bench/driver params, cap 100)
    rows.append(timed("simhash_overflow_cap100", lambda: {
        "overflow_buckets": A.simhash_lsh_overflow(
            docs, bits=48, n_bands=4, max_bucket_size=100).count()}))
    rows.append(timed("dedup_components_simhash_cap100", lambda: (
        noop(A.dedup_components_simhash(
            docs, bits=48, n_bands=4, max_bucket_size=100)))))

    # family 3: embedding LSH pairs + LSS (driver params, cap 60, numpy
    # rescore — the scale path; the fold variant is the oracle twin only)
    rows.append(timed("embedding_overflow_cap60", lambda: {
        "overflow_buckets": A.embedding_lsh_overflow(
            emb, n_bands=6, band_bits=3, max_bucket_size=60).count()}))
    rows.append(timed("dedup_components_embedding_cap60", lambda: (
        noop(A.dedup_components_embedding(
            emb, threshold=0.35, n_bands=6, band_bits=3,
            max_bucket_size=60, rescore="numpy")))))

    # family 4 (r5 s4): graph ops at 200k nodes / ~1M directed edges —
    # the ring+affine+hub fixture scaled to the soak corpus; the
    # triangle wedge join is the m^1.5-bounded step under test, the
    # co-citation cap must drop the 4k hub sources loudly
    def _soak_edges():
        n = docs.select(F.count(F.lit(1)).alias("n"))
        base = F.array(
            (F.col("doc_id") + 1) % F.col("n"),
            (F.col("doc_id") + 2) % F.col("n"),
            (F.col("doc_id") * 31 + 7) % F.col("n"),
        )
        hub = F.array(
            (F.col("doc_id") + 3) % F.col("n"),
            (F.col("doc_id") + 4) % F.col("n"),
            (F.col("doc_id") + 5) % F.col("n"),
        )
        dsts = F.when(F.col("doc_id") % 50 == 0, F.concat(base, hub)) \
            .otherwise(base)
        return (
            docs.select("doc_id")
            .crossJoin(F.broadcast(n))
            .select(F.col("doc_id").alias("src"),
                    F.explode(dsts).alias("dst"))
            .filter(F.col("src") != F.col("dst"))
        )

    rows.append(timed("triangle_count_200k", lambda: (
        noop(A.triangle_counts(_soak_edges())))))
    rows.append(timed("co_citation_cap4_200k", lambda: {
        "capped_srcs": A.co_citation_overflow(
            _soak_edges(), max_out=4).count(),
        "pairs": A.co_citation_pairs(
            _soak_edges(), max_out=4, min_count=1).count()}))

    # family 5 (r5 s5): frontier BFS + personalized PPR at 200k nodes —
    # per-round join/groupBy shape under test (4 BFS rounds, 2 PPR
    # rounds); seeds = %97 (~2k nodes), reached count disclosed
    def _seeds():
        return docs.select(F.col("doc_id").alias("node")).filter(
            F.col("node") % 97 == 0
        )

    rows.append(timed("bfs_levels_d4_200k", lambda: {
        "reached": A.bfs_levels(_soak_edges(), _seeds(),
                                max_depth=4).count()}))
    rows.append(timed("personalized_ppr_i2_200k", lambda: (
        noop(A.personalized_pagerank(_soak_edges(), _seeds(), iters=2)))))

    # family 6 (r5 s7): batched retrieval chain at 200k docs — 40
    # queries (doc_id % 5000 == 0; the 31-word vocabulary makes every
    # query term a worst-case high-df term, so each query's candidate
    # set is nearly the whole corpus — the stress is the (query, doc)
    # combine volume, ~24M contribution rows), plus the KN bigram LM
    # over the full soak corpus (40k bigram types, 12M occurrences)
    def _soak_queries():
        ws = F.split("text", " ")
        return docs.filter(F.col("doc_id") % 5000 == 0).select(
            F.col("doc_id").alias("query_id"),
            F.explode(F.array_distinct(F.slice(ws, 1, 3))).alias("term"),
        )

    rows.append(timed("bm25_batch_40q_200k", lambda: (
        noop(A.bm25_batch(docs, _soak_queries(), k=10)))))
    rows.append(timed("prf_terms_40q_200k", lambda: (
        noop(A.prf_terms(docs, _soak_queries(), fb_docs=5, k_terms=5)))))
    rows.append(timed("kn_surprisal_200k", lambda: (
        noop(A.kn_surprisal(docs)))))

    # extraction at 200k pages (sf1): steady-state docs/s
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)).rsplit(
        "/scripts", 1)[0])
    from bench import pages_parquet  # reuses the bench cache

    pages = spark.read.parquet(pages_parquet(200_000))
    extract_pages(pages.limit(2048), num_buckets=32).count()  # warm workers

    def _extract():
        n = extract_pages(pages, num_buckets=32).count()
        return {"n_pages": n}

    r = timed("extract_pages_200k", _extract)
    r["docs_per_sec"] = round(r["n_pages"] / r["wall_s"], 1)
    print(json.dumps({"extract_docs_per_sec": r["docs_per_sec"]}), flush=True)

    print(json.dumps({"soak": "done", "rows": rows}, default=str), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
