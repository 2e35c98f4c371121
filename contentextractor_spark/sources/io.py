"""Remaining reference sources/sinks (SURVEY.md §2.1).

S1 — CSV url-list scan (ContentExtractor.java:90,95-99 / :168,178-179):
     the reference drives extraction from an `id,url` CSV read line by
     line; here it is a proper DataFrame scan that joins against the page
     store (the batch reframing of the reference's per-row HBase Get, S3).

S5 — XML sink (ContentExtractor.java:170,189-196,209): the forTest path
     writes one `<document id url>` element per page wrapped in
     `<?xml?><data>…</data>`.  Reproduced byte-faithfully for parity
     artifacts; at scale you'd write parquet and render XML only for
     downstream consumers that need it.

S3/S4 (HBase get/put) map to the input-table scan and output-table write of
plans/pipeline.run_extraction — a point-get keyed store has no 10^12-scale
analog other than the bucketed table itself (SURVEY.md §2.1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import StringType, StructField, StructType

URL_LIST_SCHEMA = StructType(
    [StructField("id", StringType()), StructField("url", StringType())]
)


def read_url_list(spark: SparkSession, path: str) -> DataFrame:
    """S1: `id,url` CSV → DataFrame.  The reference splits on ',' with no
    quoting/escaping (ContentExtractor.java:99,179); mirror that."""
    lines = spark.read.text(path)
    parts = F.split(F.col("value"), ",")
    # tokens[1].trim() at :182 — Java String.trim strips EVERY char
    # <= U+0020 (tabs, CR, controls), not just ASCII space like F.trim
    # (r3 review: a tab-padded url kept its tabs and missed the page join)
    java_trim = F.regexp_replace(
        parts.getItem(1), "^[\\x00-\\x20]+|[\\x00-\\x20]+$", ""
    )
    return lines.select(parts.getItem(0).alias("id"), java_trim.alias("url"))


def lookup_pages(url_list: DataFrame, pages: DataFrame) -> DataFrame:
    """S3 reframed: the reference's per-url HBase Get becomes one join of
    the url list against the page store.  The list side is small →
    broadcast; the store side never shuffles."""
    return pages.join(F.broadcast(url_list.select("id", "url")), "url", "inner")


def _xml_escape_header(s: str) -> str:
    # the reference writes title/description/keywords raw (no escaping);
    # faithful — this is a parity artifact, not a robust XML writer
    return s


def fortest_xml(rows) -> str:
    """S5: render extraction rows exactly like forTest
    (ContentExtractor.java:170,189-196,209).

    rows: iterable of objects/dicts with id, url, title, description,
    keywords, main_text.  Quirks kept: the `<main>` element is only
    populated when main_text is non-empty; elements are newline-separated
    exactly as the Java writes them.
    """
    out = ['<?xml version="1.0" encoding="utf-8"?>\n<data>']
    for r in rows:
        get = r.get if isinstance(r, dict) else lambda k, _r=r: getattr(_r, k)
        out.append(
            f'\n<document id="{get("id")}" url="{get("url")}">\n'
            f"<title>{_xml_escape_header(get('title'))}</title>\n"
            f"<description>{_xml_escape_header(get('description'))}</description>\n"
            f"<keywords>{_xml_escape_header(get('keywords'))}</keywords>\n"
        )
        main_text = get("main_text")
        if main_text != "":
            out.append(f"<main>\n{main_text}\n</main>\n</document>\n")
        else:
            out.append("<main></main>\n</document>\n")
    out.append("</data>")
    return "".join(out)


MAX_FORTEST_XML_ROWS = 100_000
"""write_fortest_xml refusal bound (VERDICT r4 #8, the knn_bruteforce
pattern): this sink COLLECTS every row to the driver and renders one
in-memory XML string — a debug/parity artifact mirroring the reference's
forTest file (ContentExtractor.java:170), not a data path.  100k rows of
~KB-scale extracted text is already ~100 MB of driver heap; beyond that
use the parquet output table of plans/pipeline (partitioned, distributed)
and render XML per-partition if a file is truly needed."""


def write_fortest_xml(
    extracted: DataFrame, path: str, id_col: str = "url", *, force: bool = False
) -> None:
    """Collects to the driver (parity tool for small runs only — the 100 TB
    path writes the parquet output table of plans/pipeline).  Guarded:
    refuses above MAX_FORTEST_XML_ROWS unless force=True (limit-probe, not
    a full count)."""
    if not force:
        bound = MAX_FORTEST_XML_ROWS
        if extracted.limit(bound + 1).count() > bound:
            raise ValueError(
                f"write_fortest_xml refused: input exceeds {bound} rows "
                "(existence probe). This sink collects to the driver; write "
                "the parquet output table instead, or pass force=True."
            )
    rows = [
        {
            "id": r[id_col],
            "url": r["url"],
            "title": r["title"],
            "description": r["description"],
            "keywords": r["keywords"],
            "main_text": r["main_text"],
        }
        for r in extracted.collect()
    ]
    with open(path, "w", encoding="utf-8") as f:
        f.write(fortest_xml(rows))


def docs_to_jsonl(
    docs: DataFrame, cols: tuple[str, ...] = ("doc_id", "lang", "text")
) -> DataFrame:
    """(line): one JSON object string per document — the columnar form of
    the JSONL exchange format every training loader reads.  F.to_json on
    a struct, so escaping (quotes, backslashes, newlines, unicode) is the
    JVM JSON writer's job and the projection stays in whole-stage codegen;
    write the column with the text sink and the output is valid JSONL.
    Pair with write_training_shards for the file-level egress."""
    return docs.select(
        F.to_json(F.struct(*[F.col(c) for c in cols])).alias("line")
    )


def jsonl_to_docs(lines: DataFrame, schema: str) -> DataFrame:
    """(…schema columns): parse a JSONL line column back into typed
    columns — F.from_json (JVM Jackson parser, codegen'd), the ingestion
    edge for JSONL corpora when they arrive as a column rather than files
    (spark.read.json covers the file case).  Malformed lines yield a
    null struct → null columns, never an executor crash."""
    return lines.select(
        F.from_json(F.col("line"), schema).alias("r")
    ).select("r.*")


def write_orc_partitioned(
    docs: DataFrame,
    path: str,
    partition_col: str = "lang",
    mode: str = "error",
) -> None:
    """ORC egress partitioned by a low-cardinality column (lang by
    default) — the columnar interchange format Hive-lineage consumers
    expect when parquet isn't an option.  partitionBy gives one
    directory per value so downstream readers prune at the DIRECTORY
    level before any file is opened; executors write their own files and
    the driver never touches the data path.  mode follows Spark
    semantics and DEFAULTS TO 'error' (existing output raises).

    Scale: keep partition_col low-cardinality (lang, crawl date, source
    tier) — one dir per value, and a high-cardinality choice produces
    the millions-of-tiny-files failure mode.  Avro is NOT offered: the
    spark-avro module jar is absent from this runtime (verified —
    'Failed to find data source: avro'), same story as Iceberg."""
    docs.write.partitionBy(partition_col).mode(mode).format("orc").save(
        path
    )


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC ingestion edge.  Filters on the partition column become
    PartitionFilters (directory pruning, no file opened); filters on
    data columns reach the ORC reader as PushedFilters, where its
    built-in min/max stride indexes skip row groups — both pinned by
    tests/test_orc_roundtrip.py against the scan plan."""
    return spark.read.format("orc").load(path)


def write_training_shards(
    docs: DataFrame,
    path: str,
    docs_per_shard: int = 1000,
    n_partitions: int | None = None,
    fmt: str = "json",
    mode: str = "error",
) -> None:
    """Shard the curated corpus for training loaders: JSONL (or parquet)
    files with a BOUNDED record count per file via Spark's native
    maxRecordsPerFile.

    Determinism: partitioning is HASH on doc_id (pmod(xxhash64)) — not
    repartitionByRange, whose sampled bounds differ per run — and rows are
    sorted by doc_id within each partition, so regenerating from identical
    input reproduces identical doc→shard membership and in-file order
    (what a loader's resume/replay keyed on shard identity needs).

    mode follows Spark semantics and DEFAULTS TO 'error' (existing output
    raises); pass mode='overwrite' explicitly to replace a shard dir.

    Scale: executors write their own shards, the driver never touches the
    data path.  Pass n_partitions ≈ corpus_size / (shards_per_task ×
    docs_per_shard); default keeps the input partitioning and lets
    maxRecordsPerFile bound file sizes alone."""
    out = docs
    if n_partitions is not None:
        out = docs.repartition(
            n_partitions, F.pmod(F.xxhash64("doc_id"), F.lit(n_partitions))
        )
    (
        out.sortWithinPartitions("doc_id")
        .write.option("maxRecordsPerFile", docs_per_shard)
        .mode(mode)
        .format(fmt)
        .save(path)
    )
