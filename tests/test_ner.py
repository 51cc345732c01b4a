"""Dictionary NER: longest-match lookahead semantics
(reference nertokenizer.py:45-283)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from greynirserver_spark.functions.ner import recognize_entities


ENTITIES = [
    ("e1", "Jón Sigurðsson"),
    ("e2", "Jón"),
    ("e3", "Háskóli Íslands"),
    ("e4", "Seðlabanki"),
    ("e5", "Jón Sigurðsson Yngri"),
]


def test_longest_match_wins(spark):
    docs = spark.createDataFrame(
        [
            (1, "Forseti Jón Sigurðsson talaði í dag."),
            (2, "Jón kom heim."),
            (3, "Jón Sigurðsson Yngri og Seðlabanki funduðu."),
            (4, "Háskóli Íslands og Seðlabanki. Jón Sigurðsson mætti."),
            (5, "Ekkert nafn hér."),
        ],
        "doc_id long, text string",
    )
    got = {
        (r.doc_id, r.pos, r.entity_id)
        for r in recognize_entities(docs, ENTITIES).collect()
    }
    assert (1, 1, "e1") in got          # 2-token beats 1-token "Jón"
    assert (1, 1, "e2") not in got
    assert (2, 0, "e2") in got          # bare "Jón" still found alone
    assert (3, 0, "e5") in got          # 3-token beats 2-token
    assert (3, 0, "e1") not in got
    assert (3, 4, "e4") in got
    # doc 4 tokens: háskóli(0) íslands(1) og(2) seðlabanki(3) jón(4) ...
    assert (4, 0, "e3") in got and (4, 3, "e4") in got and (4, 4, "e1") in got
    assert not any(d == 5 for d, _, _ in got)
    # no match starting inside a longer match
    assert (3, 1, "e2") not in got and (1, 2, "e2") not in got


def test_case_insensitive(spark):
    docs = spark.createDataFrame(
        [(1, "SEÐLABANKI hækkaði vexti. jón sigurðsson mótmælti.")],
        "doc_id long, text string",
    )
    got = {(r.pos, r.entity_id) for r in recognize_entities(docs, ENTITIES).collect()}
    assert (0, "e4") in got
    assert (3, "e1") in got
