"""More end-to-end archetype goldens (FIXTURES.md §3: A2, A3, A4, A9),
hand-derived from the reference algorithm."""

from contentextractor_spark.extractor import extract_from_html

J1 = "これは一行目の本文でありまして長い日本語の文章です"
J2 = "これは二行目の本文でありまして内容の密度が高いです"
J3 = "これは三行目の本文でありまして記事の中心になります"


def test_a3_japanese_blog():
    html = (
        "<html><head><title>ブログ</title></head><body>"
        '<div><div>トピックス</div><ul><li><a href="/t1">記事</a></li></ul></div>'
        f'<div class="entry"><p>{J1}</p><p>{J2}</p><p>{J3}</p></div>'
        '<a href="/n">次へ</a><a href="/p">前へ</a>'
        "</body></html>"
    )
    res = extract_from_html(html)
    assert res.title == "ブログ"
    # F2 removed the topic block's parent; F7 removed pagination links
    assert res.main_text == J1 + "\n" + J2 + "\n" + J3
    assert "次へ" not in res.main_text
    assert "トピックス" not in res.main_text


def test_a2_link_farm_only_body_text_survives():
    links = "".join(f'<li><a href="/{i}">link text {i}</a></li>' for i in range(30))
    body_line = "The actual article content sentence with enough density to pass"
    html = (
        f"<html><body><ul>{links}</ul>"
        f"<div><p>{body_line}</p><p>{body_line}</p><p>{body_line}</p></div>"
        "</body></html>"
    )
    res = extract_from_html(html)
    assert "link text" not in res.main_text
    assert res.main_text == "\n".join([body_line] * 3)


def test_a4_br_formatted_body():
    l1 = "first line of the br formatted body text"
    l2 = "second line of the br formatted body text"
    l3 = "third line of the br formatted body text"
    html = f"<html><body><div>{l1}<br><br><br>{l2}<br>{l3}</div></body></html>"
    res = extract_from_html(html)
    # T3 collapses the <br> run to one; T4 maps each <br> to one newline
    assert res.main_text == l1 + "\n" + l2 + "\n" + l3


def test_a4_short_lines_below_min_tokens_floor():
    # 5-char lines: block max density 4 < min_tokens floor 5 → nothing emitted
    html = "<html><body><div>line1<br><br><br>line2<br>line3</div></body></html>"
    res = extract_from_html(html)
    assert res.main_text == ""
    assert res.threshold == 5


def test_a9_long_page_caps_at_101_lines():
    paras = "".join(
        f"<p>long page line number {i} with plenty of extra words to score</p>"
        for i in range(130)
    )
    html = f"<html><body><div>{paras}</div></body></html>"
    res = extract_from_html(html)
    assert res.main_text.count("\n") == 100  # 101 lines, final \n trimmed
