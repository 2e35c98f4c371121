"""S1 CSV url-list source + S5 XML sink goldens (SURVEY.md §2.1)."""

from contentextractor_spark.sources.io import (
    fortest_xml,
    lookup_pages,
    read_url_list,
)


def test_read_url_list(spark, tmp_path):
    p = tmp_path / "url.csv"
    p.write_text("1,https://a.example/x\n2, https://b.example/y \n")
    rows = {r.id: r.url for r in read_url_list(spark, str(p)).collect()}
    # tokens[1].trim() semantics (ContentExtractor.java:182)
    assert rows == {"1": "https://a.example/x", "2": "https://b.example/y"}


def test_lookup_pages_is_broadcast_join(spark, tmp_path):
    from contentextractor_spark.plans.pipeline import PAGES_SCHEMA
    from contentextractor_spark.sources.pages import generate_pages

    pages = spark.createDataFrame(generate_pages(30, seed=42), PAGES_SCHEMA)
    p = tmp_path / "u.csv"
    urls = [r.url for r in pages.select("url").limit(5).collect()]
    p.write_text("".join(f"{i},{u}\n" for i, u in enumerate(urls)))
    ulist = read_url_list(spark, str(p))
    joined = lookup_pages(ulist, pages)
    assert joined.count() == 5
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_fortest_xml_shape():
    rows = [
        {
            "id": "1",
            "url": "https://a/x",
            "title": "T",
            "description": "D",
            "keywords": "K",
            "main_text": "line1\nline2",
        },
        {
            "id": "2",
            "url": "https://a/y",
            "title": "",
            "description": "",
            "keywords": "",
            "main_text": "",
        },
    ]
    xml = fortest_xml(rows)
    assert xml.startswith('<?xml version="1.0" encoding="utf-8"?>\n<data>')
    assert xml.endswith("</data>")
    # populated main (ContentExtractor.java:193-194)
    assert "<main>\nline1\nline2\n</main>\n</document>" in xml
    # empty main shortcut (:196)
    assert "<main></main>\n</document>" in xml
    assert '<document id="1" url="https://a/x">' in xml
