"""Table extraction walker (pure mapInPandas-body tests — no Spark):
document-order indices, nested-table isolation, th/td flags, and the
per-page error contract."""

import pandas as pd

from contentextractor_spark.plans.pipeline import _extract_table_batches


def _run(html_bytes, url="u1"):
    pdf = pd.DataFrame({"url": [url], "html": [html_bytes], "bucket_id": [0]})
    frames = list(_extract_table_batches(iter([pdf])))
    if not frames:
        return pd.DataFrame(
            columns=["url", "table_idx", "row_idx", "col_idx", "is_header", "cell"]
        )
    return pd.concat(frames, ignore_index=True)


def test_document_order_and_header_flags():
    out = _run(
        b"<html><body><table><tr><th>h1</th><th>h2</th></tr>"
        b"<tr><td>a</td><td>b <b>bold</b></td></tr></table></body></html>"
    )
    rows = list(
        out[["table_idx", "row_idx", "col_idx", "is_header", "cell"]].itertuples(
            index=False, name=None
        )
    )
    assert rows == [
        (0, 0, 0, 1, "h1"),
        (0, 0, 1, 1, "h2"),
        (0, 1, 0, 0, "a"),
        (0, 1, 1, 0, "b bold"),  # inline markup folds into jsoup text()
    ]


def test_nested_table_gets_own_index_not_parent_rows():
    out = _run(
        b"<html><body><table><tr>"
        b"<td>outer <table><tr><td>inner</td></tr></table></td>"
        b"<td>sib</td></tr></table></body></html>"
    )
    rows = list(
        out[["table_idx", "row_idx", "col_idx", "cell"]].itertuples(
            index=False, name=None
        )
    )
    # outer table: 2 cells in ONE row (nested rows must not leak in);
    # enclosing cell text includes the nested table's text (jsoup);
    # nested table re-emitted under its own table_idx
    assert rows == [
        (0, 0, 0, "outer inner"),
        (0, 0, 1, "sib"),
        (1, 0, 0, "inner"),
    ]


def test_empty_table_and_garbage_page():
    assert len(_run(b"<html><body><table></table></body></html>")) == 0
    assert len(_run(b"\xff\xfe garbage \x00\x01")) == 0
    assert len(_run(None)) == 0


def test_multiple_pages_batch():
    pdf = pd.DataFrame(
        {
            "url": ["a", "b"],
            "html": [
                b"<table><tr><td>x</td></tr></table>",
                b"<table><tr><td>y</td></tr></table>",
            ],
            "bucket_id": [0, 1],
        }
    )
    out = pd.concat(list(_extract_table_batches(iter([pdf]))), ignore_index=True)
    assert list(out["url"]) == ["a", "b"]
    assert list(out["cell"]) == ["x", "y"]
    assert list(out["bucket_id"]) == [0, 1]


def test_table_kv_headerless_drops(spark):
    # Spark-level composition: header-keyed pairs; headerless table gone
    from contentextractor_spark.functions import analysis as A

    cells = spark.createDataFrame(
        [
            ("u", 0, 0, 0, 1, "k1"),
            ("u", 0, 0, 1, 1, "k2"),
            ("u", 0, 1, 0, 0, "v1"),
            ("u", 0, 1, 1, 0, "v2"),
            ("u", 0, 2, 0, 0, "v3"),
            ("u", 0, 2, 2, 0, "wide"),   # no header col 2 -> dropped
            ("u", 1, 0, 0, 0, "nohdr"),  # is_header=0 row 0 -> no keys
            ("u", 1, 1, 0, 0, "lost"),
        ],
        "url string, table_idx int, row_idx int, col_idx int, "
        "is_header int, cell string",
    )
    got = {
        (r.table_idx, r.row_idx, r.key): r.value
        for r in A.table_kv(cells).collect()
    }
    assert got == {
        (0, 1, "k1"): "v1",
        (0, 1, "k2"): "v2",
        (0, 2, "k1"): "v3",
    }


def test_meta_robots_semantics():
    from contentextractor_spark.plans.pipeline import _extract_meta_robots_batches

    pages = [
        ("a", b'<html><head><meta name="robots" content="noindex, follow"></head></html>'),
        ("b", b'<html><head><meta name="ROBOTS" content="NOFOLLOW"></head></html>'),
        ("c", b"<html><head><title>t</title></head></html>"),
        ("d", b'<html><head><meta name="robots" content="none"></head></html>'),
        ("e", b'<html><head><meta name="robots" content="all"></head></html>'),
        ("f", b'<html><head><meta name="robots" content="noindex">'
              b'<meta name="robots" content="nofollow"></head></html>'),
    ]
    pdf = pd.DataFrame(
        {
            "url": [p[0] for p in pages],
            "html": [p[1] for p in pages],
            "bucket_id": [0] * len(pages),
        }
    )
    out = pd.concat(
        list(_extract_meta_robots_batches(iter([pdf]))), ignore_index=True
    )
    got = {
        r.url: (r.noindex, r.nofollow, r.content)
        for r in out.itertuples(index=False)
    }
    assert got["a"] == (1, 0, "noindex, follow")
    assert got["b"] == (0, 1, "NOFOLLOW")        # case-insensitive
    assert got["c"] == (0, 0, None)              # no meta -> indexable
    assert got["d"] == (1, 1, "none")            # 'none' expands
    assert got["e"] == (0, 0, "all")             # 'all' asserts neither
    assert got["f"] == (1, 1, "noindex")         # union; first content
