"""End-to-end byte-identity: extractor(html) == pages.text for every url.

The generator computes expected text constructively from its templates;
the extractor computes it from the HTML — agreement proves the per-row
invariant (BASELINE.json input_hint) without circularity.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from greynirserver_spark.corpus import generate_pages_pdf, vocabulary
from greynirserver_spark.extraction import WELL_FORMED_RE, extract_document


def test_vocabulary_deterministic_and_special_cases():
    v = vocabulary()
    assert len(v) == 20000
    assert v["stem"].is_unique
    # stoplist pairs present
    assert ((v["stem"] == "vera") & (v["cat"] == "so")).any()
    # over-long stems present
    assert (v["stem"].str.len() > 64).sum() >= 3
    # hyphen/space stems present
    assert (v["stem"] == "tölvu-póstur").any()
    assert (v["stem"] == "hægri grænir").any()
    # Zipf head: rank-0 term has much higher mass than rank-1000
    assert v["p"].iloc[0] > 50 * v["p"].iloc[1000]


def test_byte_identity_200_docs():
    pages = generate_pages_pdf(200)
    assert pages["url"].is_unique
    mismatches = []
    for _, row in pages.iterrows():
        got = extract_document(row["html"])
        assert WELL_FORMED_RE.match(got), row["url"]
        if got != row["text"]:
            mismatches.append((row["url"], row["text"][:120], got[:120]))
    assert not mismatches, mismatches[:3]


def test_generator_is_counter_based():
    # Doc 57 generated alone == doc 57 generated in a batch
    solo = generate_pages_pdf(1, start=57)
    batch = generate_pages_pdf(100)
    assert solo.iloc[0]["url"] == batch.iloc[57]["url"]
    assert solo.iloc[0]["text"] == batch.iloc[57]["text"]
    assert solo.iloc[0]["html"] == batch.iloc[57]["html"]
