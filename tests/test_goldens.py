"""Committed archetype goldens (FIXTURES.md §2 golden_main_text).

Pins the extraction output for 200 seed-42 synthetic pages spanning all
archetypes.  Hand-verified correctness lives in the per-operator unit
goldens (test_textextract / test_tagfilter / test_charset_extractor); this
file guards against regressions across the whole fused pipeline, including
any future optimization of the DOM→lines path (SURVEY.md §3 fusion note:
optimizations must keep these bytes identical).
"""

import hashlib
import json
import os

from contentextractor_spark.extractor import extract_document
from contentextractor_spark.sources.pages import generate_pages

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "goldens", "archetypes_200.json")


def test_archetype_goldens_byte_identical():
    with open(GOLDEN_PATH, encoding="utf-8") as f:
        goldens = json.load(f)
    df = generate_pages(200, seed=42)
    assert len(goldens) == 200
    mismatches = []
    for _, row in df.iterrows():
        want = goldens[row["url"]]
        res = extract_document(bytes(row["html"]))
        got_sha = hashlib.sha256(res.main_text.encode()).hexdigest()
        if (
            got_sha != want["main_text_sha256"]
            or res.title != want["title"]
            or len(res.spans) != want["n_spans"]
            or res.threshold != want["threshold"]
            or res.status != want["status"]
        ):
            mismatches.append(row["url"])
    assert mismatches == [], f"{len(mismatches)} pages diverged: {mismatches[:5]}"
