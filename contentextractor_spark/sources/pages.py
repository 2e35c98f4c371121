"""Deterministic synthetic Common-Crawl-style pages table (FIXTURES.md §1).

Schema (BASELINE.json input_hint):
    url:string, warc_ts:timestamp, html:binary, text:string, lang:string

Generation rules (seed 42, FIXTURES.md §5):
 - hosts drawn Zipf-ish(1.2) from 50 synthetic hosts — forces the host skew
   the salting stage must handle; path unique per row
 - warc_ts = 2026-01-01T00:00:00Z + row_id seconds (no wall clock)
 - html rendered from the archetype templates of FIXTURES.md §3 and encoded
   UTF-8 (90%) / Shift_JIS (5%) / EUC-JP (5%)
 - lang ja/en/mixed 60/30/10 drives template text language

Pure: same (n, seed) → byte-identical rows, stable order.  Used by tests,
bench.py and __spark_entry__.entry(); the 100 TB production input would be
an Iceberg table with this exact schema.
"""

from __future__ import annotations

import datetime as _dt

import numpy as np
import pandas as pd

EPOCH = _dt.datetime(2026, 1, 1, 0, 0, 0)

_EN_WORDS = (
    "the quick brown fox jumps over lazy dog content page article text "
    "world data stream spark engine extract main body section news story "
    "report update market science culture travel design music history"
).split()

_JA_CHARS = list("日本語記事内容本文情報文化技術経済社会生活旅行音楽歴史科学自然")
_JA_KANA = list("あいうえおかきくけこさしすせそたちつてとなにぬねのはひふへほまみむめも")

_NAV_WORDS = ["home", "about", "news", "contact", "login", "search", "archive"]
_JA_NAV = ["トップページ", "ホーム", "問い合わせ", "案内", "プライバシー"]


def _en_sentence(rng: np.random.Generator, nwords: int) -> str:
    idx = rng.integers(0, len(_EN_WORDS), size=nwords)
    return " ".join(_EN_WORDS[i] for i in idx)


def _ja_sentence(rng: np.random.Generator, nchars: int) -> str:
    parts = []
    for _ in range(nchars):
        pool = _JA_CHARS if rng.random() < 0.6 else _JA_KANA
        parts.append(pool[int(rng.integers(0, len(pool)))])
    return "".join(parts)


def _body_paragraphs(rng: np.random.Generator, lang: str, nlines: int) -> list[str]:
    out = []
    for _ in range(nlines):
        if lang == "ja" or (lang == "mixed" and rng.random() < 0.5):
            out.append(_ja_sentence(rng, int(rng.integers(20, 60))))
        else:
            out.append(_en_sentence(rng, int(rng.integers(8, 20))))
    return out


def _nav_block(rng: np.random.Generator, lang: str, n: int) -> str:
    words = _JA_NAV if lang == "ja" else _NAV_WORDS
    links = "".join(
        f'<li><a href="/{i}">{words[int(rng.integers(0, len(words)))]}</a></li>'
        for i in range(n)
    )
    return f"<ul>{links}</ul>"


def render_archetype(rng: np.random.Generator, archetype: int, lang: str) -> str:
    """Render one page; archetype ids follow FIXTURES.md §3 (A1..A10)."""
    title = (
        _ja_sentence(rng, 8) if lang == "ja" else _en_sentence(rng, 4)
    )
    paras = _body_paragraphs(rng, lang, int(rng.integers(8, 40)))
    body_core = "".join(f"<p>{p}</p>" for p in paras)
    head = (
        f"<head><title>{title}</title>"
        f'<meta name="description" content="{_en_sentence(rng, 6)}">'
        f'<meta name="keywords" content="k1,k2,k3"></head>'
    )
    nav = _nav_block(rng, lang, int(rng.integers(5, 12)))

    if archetype == 1:  # plain article + boilerplate
        body = (
            f'<div id="header">{nav}</div>'
            f'<div class="article">{body_core}</div>'
            f'<div class="footer">{nav}</div>'
        )
    elif archetype == 2:  # link farm
        body = _nav_block(rng, lang, 30) + f"<div>{body_core}</div>"
    elif archetype == 3:  # japanese blog with topic div + pagination
        body = (
            f"<div><div>トピックス</div>{nav}</div>"
            f'<div class="entry">{body_core}</div>'
            f'<a href="/next">次へ</a><a href="/prev">前へ</a>'
        )
    elif archetype == 4:  # <br>-formatted body
        brs = "<br>" * int(rng.integers(2, 5))
        body = "<div>" + brs.join(paras) + "</div>"
    elif archetype == 5:  # hidden/styling noise
        body = (
            '<div style="display:none">invisible junk here</div>'
            '<span style="font-size:9px">tiny print</span>'
            "<script>var x = 1;</script><noscript>noscript</noscript>"
            f'<div class="main">{body_core}</div>'
        )
    elif archetype == 9:  # long page
        paras_long = _body_paragraphs(rng, lang, 130)
        body = "<div>" + "".join(f"<p>{p}</p>" for p in paras_long) + "</div>"
    else:  # 6,7,8,10 default article shape (charset variation handled outside)
        body = f"<div>{body_core}</div>"
    return f"<html>{head}<body>{body}</body></html>"


def generate_pages(n: int, seed: int = 42, n_hosts: int = 50) -> pd.DataFrame:
    """Deterministic pages table; see module docstring."""
    rng = np.random.default_rng(seed)
    # Zipf-ish host popularity (exponent 1.2), normalized over n_hosts
    ranks = np.arange(1, n_hosts + 1, dtype=np.float64)
    probs = ranks ** -1.2
    probs /= probs.sum()
    host_idx = rng.choice(n_hosts, size=n, p=probs)

    langs = rng.choice(["ja", "en", "mixed"], size=n, p=[0.6, 0.3, 0.1])
    encodings = rng.choice(["utf-8", "shift_jis", "euc_jp"], size=n, p=[0.9, 0.05, 0.05])
    archetypes = rng.choice([1, 2, 3, 4, 5, 9, 6], size=n, p=[0.3, 0.1, 0.15, 0.1, 0.1, 0.05, 0.2])
    # D1-breadth archetypes (round 2): sprinkle ISO-2022-JP (meta-declared,
    # 7-bit wire form) and UTF-16LE-with-BOM pages.  Deterministic index
    # override of already-ja utf-8 pages — the rng stream and every other
    # page's bytes stay identical to round 1.
    encodings = [str(e) for e in encodings]  # numpy '<U9' would truncate
    for i in range(n):
        if langs[i] == "ja" and encodings[i] == "utf-8":
            if i % 53 == 11:
                encodings[i] = "iso2022_jp"
            elif i % 53 == 37:
                encodings[i] = "utf16"

    urls, ts, htmls, out_lang = [], [], [], []
    for i in range(n):
        host = f"site{host_idx[i]:02d}.example.jp"
        lang = str(langs[i])
        enc = str(encodings[i])
        if enc in ("shift_jis", "euc_jp"):
            lang = "ja"  # JP-limited encodings carry JP pages
        page = render_archetype(rng, int(archetypes[i]), lang)
        if enc in ("shift_jis", "euc_jp", "iso2022_jp"):
            cs_name = {
                "shift_jis": "Shift_JIS",
                "euc_jp": "EUC-JP",
                "iso2022_jp": "ISO-2022-JP",
            }[enc]
            page = page.replace(
                "<head>",
                f'<head><meta http-equiv="Content-Type" '
                f'content="text/html; charset={cs_name}">',
                1,
            )
        if enc == "utf16":
            # BOM + LE body; no meta — only the BOM sniff can decode it
            data = b"\xff\xfe" + page.encode("utf-16-le")
        else:
            try:
                data = page.encode(enc)
            except UnicodeEncodeError:
                data = page.encode("utf-8")
        urls.append(f"https://{host}/p{i}")
        ts.append(EPOCH + _dt.timedelta(seconds=i))
        htmls.append(data)
        out_lang.append(lang)

    return pd.DataFrame(
        {
            "url": pd.Series(urls, dtype="string"),
            "warc_ts": pd.Series(ts, dtype="datetime64[us]"),
            "html": pd.Series(htmls, dtype=object),
            "text": pd.Series([""] * n, dtype="string"),
            "lang": pd.Series(out_lang, dtype="string"),
        }
    )


def write_pages_parquet(path: str, n: int, seed: int = 42, n_files: int = 32) -> str:
    """Materialize a pages table as a parquet *directory* of n_files files —
    a single fat file would make the Spark scan (and the shuffle-map side)
    single-task; real crawl tables are many-file, so the bench input should
    be too."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    df = generate_pages(n, seed=seed)
    schema = pa.schema(
        [
            ("url", pa.string()),
            ("warc_ts", pa.timestamp("us")),
            ("html", pa.binary()),
            ("text", pa.string()),
            ("lang", pa.string()),
        ]
    )
    os.makedirs(path, exist_ok=True)
    n_files = max(1, min(n_files, n))
    chunk = (n + n_files - 1) // n_files
    for i in range(n_files):
        part = df.iloc[i * chunk:(i + 1) * chunk]
        if len(part) == 0:
            break
        table = pa.Table.from_pandas(part, schema=schema, preserve_index=False)
        pq.write_table(table, os.path.join(path, f"part-{i:05d}.parquet"))
    return path
