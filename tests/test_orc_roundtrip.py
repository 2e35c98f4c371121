"""ORC sink/source roundtrip (sources/io.py write_orc_partitioned /
read_orc) — the Hive-lineage columnar interchange edge next to parquet.

Scale claims under test, pinned against the physical plan:
  * a partition-column predicate lives in PartitionFilters (directory
    pruning — no file under the excluded lang is ever opened);
  * a data-column predicate reaches the ORC reader as PushedFilters
    (its min/max stride indexes skip row groups);
  * hostile text (quote/backslash/tab/newline/unicode) survives the
    serde byte-for-byte.
The driver row `orc_roundtrip` hash-checks the same pipeline against
DuckDB over the raw parquet at sf0.01.
"""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def orc_store(spark, tmp_path_factory):
    from contentextractor_spark.sources.io import write_orc_partitioned

    path = str(tmp_path_factory.mktemp("docs_orc")) + "/docs"
    rows = [
        (
            i,
            "plain %d" % i if i % 3 else 'hostile " \\ \t \n \u00e9\u4e2d %d' % i,
            ["en", "fr", "ja"][i % 3],
        )
        for i in range(60)
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string, lang string")
    write_orc_partitioned(docs, path, mode="overwrite")
    return path


def test_orc_roundtrip_values(spark, orc_store):
    from contentextractor_spark.sources.io import read_orc

    back = read_orc(spark, orc_store)
    assert back.count() == 60
    got = {
        r["doc_id"]: (r["text"], r["lang"])
        for r in back.collect()
    }
    assert got[3] == ('hostile " \\ \t \n \u00e9\u4e2d 3', "en")
    assert got[4] == ("plain 4", "fr")
    assert len(got) == 60


def test_orc_partition_pruning(spark, orc_store):
    from contentextractor_spark.sources.io import read_orc

    ja = read_orc(spark, orc_store).filter(F.col("lang") == "ja")
    plan = ja._jdf.queryExecution().executedPlan().toString()
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and "lang" in pf[0], plan
    files = [
        r[0] for r in ja.select(F.input_file_name()).distinct().collect()
    ]
    assert files and all("lang=ja" in f for f in files), files


def test_orc_predicate_pushdown(spark, orc_store):
    from contentextractor_spark.sources.io import read_orc

    small = read_orc(spark, orc_store).filter(F.col("doc_id") < 10)
    plan = small._jdf.queryExecution().executedPlan().toString()
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert pushed and "doc_id" in pushed[0], plan
    assert small.count() == 10


def test_orc_write_mode_error_raises(spark, orc_store):
    from contentextractor_spark.sources.io import write_orc_partitioned

    docs = spark.createDataFrame(
        [(1, "x", "en")], "doc_id bigint, text string, lang string"
    )
    with pytest.raises(Exception):
        write_orc_partitioned(docs, orc_store)  # default mode='error'
