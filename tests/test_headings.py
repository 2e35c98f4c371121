"""Outline extraction walker: numbering semantics (skip-level zeros,
h2-start, reset on new h1), preorder document order, and the zero-rows
error contract — all without Spark (the extract_tables precedent)."""

import pandas as pd

from contentextractor_spark.plans.pipeline import _extract_heading_batches


def _run(html: bytes):
    batch = pd.DataFrame(
        {"url": ["p"], "html": [html], "bucket_id": [0]}
    )
    out = list(_extract_heading_batches(iter([batch])))
    if not out:
        return []
    df = pd.concat(out)
    return list(
        zip(df["h_idx"], df["level"], df["sec"], df["text"])
    )


def test_outline_numbering():
    html = (
        b"<html><body><h1>A</h1><h2>A1</h2><h3>A1a</h3><h2>A2</h2>"
        b"<h3>A2a</h3><h1>B</h1><h2>B1</h2></body></html>"
    )
    assert _run(html) == [
        (0, 1, "1", "A"),
        (1, 2, "1.1", "A1"),
        (2, 3, "1.1.1", "A1a"),
        (3, 2, "1.2", "A2"),
        (4, 3, "1.2.1", "A2a"),
        (5, 1, "2", "B"),       # new h1 resets the deeper counters
        (6, 2, "2.1", "B1"),
    ]


def test_skipped_levels_keep_zero():
    html = b"<html><body><h1>A</h1><h3>deep</h3><h2>up</h2></body></html>"
    assert _run(html) == [
        (0, 1, "1", "A"),
        (1, 3, "1.0.1", "deep"),  # no h2 yet -> its counter stays 0
        (2, 2, "1.1", "up"),
    ]


def test_h2_start_numbers_zero_prefix():
    html = b"<html><body><h2>intro</h2><h2>more</h2></body></html>"
    assert _run(html) == [(0, 2, "0.1", "intro"), (1, 2, "0.2", "more")]


def test_preorder_document_order():
    html = (
        b"<html><body><div><h2>first</h2><div><h3>nested</h3></div></div>"
        b"<h2>second</h2></body></html>"
    )
    assert [t for _, _, _, t in _run(html)] == ["first", "nested", "second"]


def test_garbage_page_never_raises():
    # the per-URL catch-all: undecodable bytes, None, and truncated
    # markup all yield a (possibly empty) row list, never an exception
    for payload in (b"\xff\xfe\x00garbage not html", None, b"<h1 unclosed"):
        batch = pd.DataFrame(
            {"url": ["p"], "html": [payload], "bucket_id": [0]}
        )
        out = list(_extract_heading_batches(iter([batch])))
        assert isinstance(out, list)


def test_headless_page_zero_rows():
    assert _run(b"<html><body><p>no headings here</p></body></html>") == []


def test_empty_batch_yields_nothing():
    out = list(
        _extract_heading_batches(
            iter([pd.DataFrame({"url": [], "html": [], "bucket_id": []})])
        )
    )
    assert out == []
