"""Session-14 operators: cdc_apply (MERGE INTO / CDC compaction) —
latest-wins semantics, delete absence, packed-argmax tie rule, and the
loud refusal paths (out-of-bounds pack, null ts, unknown op)."""

import pytest
from pyspark.errors import PySparkRuntimeError
from py4j.protocol import Py4JJavaError

from contentextractor_spark.functions import events as E


def _changes(spark, rows):
    return spark.createDataFrame(
        rows, "key long, op string, value string, ts long, id long"
    )


def test_cdc_apply_latest_delete_absent(spark):
    df = _changes(
        spark,
        [
            (1, "U", "a", 10, 1),
            (1, "D", None, 20, 2),   # key 1: latest is delete -> absent
            (2, "U", "b", 10, 3),
            (2, "D", None, 20, 4),
            (2, "U", "c", 30, 5),    # key 2: resurrected after delete
        ],
    )
    out = {r["key"]: r.asDict() for r in E.cdc_apply(df).collect()}
    assert set(out) == {2}
    assert out[2]["value"] == "c"
    assert out[2]["last_ts"] == 30 and out[2]["last_id"] == 5
    assert out[2]["n_changes"] == 3 and out[2]["n_deletes"] == 1


def test_cdc_apply_tie_max_id_wins(spark):
    # tie-heavy ts: the (ts, id) pack makes max() the argmax, so the
    # larger id wins at an exact-ts tie (the latest_snapshot family)
    df = _changes(
        spark,
        [(7, "U", "first", 100, 10), (7, "U", "second", 100, 11)],
    )
    rows = E.cdc_apply(df).collect()
    assert len(rows) == 1
    assert rows[0]["value"] == "second" and rows[0]["last_id"] == 11


def test_cdc_apply_python_replica(spark):
    rows = [
        (k, "D" if (k * 7 + i) % 5 == 0 else "U", f"v{k}-{i}",
         1000 + (i * 13) % 9, k * 100 + i)
        for k in range(6)
        for i in range(8)
    ]
    df = _changes(spark, rows)
    got = {r["key"]: r.asDict() for r in E.cdc_apply(df).collect()}

    expect = {}
    for k in range(6):
        recs = [r for r in rows if r[0] == k]
        win = max(recs, key=lambda r: r[3] * 2**20 + r[4])
        if win[1] == "U":
            expect[k] = {
                "value": win[2],
                "last_ts": win[3],
                "last_id": win[4],
                "n_changes": len(recs),
                "n_deletes": sum(1 for r in recs if r[1] == "D"),
            }
    assert set(got) == set(expect)
    for k, e in expect.items():
        for c, v in e.items():
            assert got[k][c] == v, (k, c, got[k][c], v)


def _assert_raises(df):
    with pytest.raises((PySparkRuntimeError, Py4JJavaError, Exception)):
        df.collect()


def test_cdc_apply_oob_ts_raises(spark):
    df = _changes(spark, [(1, "U", "a", 2**42, 1)])
    _assert_raises(E.cdc_apply(df))


def test_cdc_apply_null_ts_raises(spark):
    # max() ignores nulls — a null ts must refuse loudly, never vanish
    # from the argmax (the latest_snapshot null-flag lesson)
    df = _changes(spark, [(1, "U", "a", None, 1), (1, "U", "b", 5, 2)])
    _assert_raises(E.cdc_apply(df))


def test_cdc_apply_unknown_op_raises(spark):
    df = _changes(spark, [(1, "X", "a", 10, 1)])
    _assert_raises(E.cdc_apply(df))
