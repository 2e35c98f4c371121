"""S6 debug side-channels as a queryable table (SURVEY.md §2.1 S6)."""

from contentextractor_spark.extractor import decode_html
from contentextractor_spark.functions.textextract import parse as te_parse
from contentextractor_spark.operators.dom import parse_xml
from contentextractor_spark.operators.tagfilter import tag_filtering
from contentextractor_spark.plans.pipeline import PAGES_SCHEMA, extract_debug_channels
from contentextractor_spark.sources.pages import generate_pages


def test_debug_channels_match_oracle(spark):
    pdf = generate_pages(40, seed=42)
    df = spark.createDataFrame(pdf, schema=PAGES_SCHEMA)
    got = {r.url: r for r in extract_debug_channels(df).collect()}
    assert len(got) == 40
    for _, row in pdf.iterrows():
        html = decode_html(bytes(row["html"]))
        body_html = tag_filtering(parse_xml(html).select_first("body"))
        r = got[row["url"]]
        assert r.status == "ok"
        if body_html is None:
            assert r.density == []
            continue
        res = te_parse(body_html)
        assert r.density == [int(x) for x in res.density]
        assert r.threshold == res.threshold
        assert [
            (b.start_line, b.end_line, b.block_max, b.block_sum) for b in r.blocks
        ] == [(b[0], b[1], int(b[2]), int(b[3])) for b in res.blocks]
