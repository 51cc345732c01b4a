"""Spelling, declension and dictionary qtypes."""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from greynirserver_spark.corpus import generate_pages_pdf
from greynirserver_spark.plans.lineage import build_index_checkpointed
from greynirserver_spark.query.router import Router
from greynirserver_spark.query.words import (
    declension_answer,
    dictionary_answer,
    parse_word_query,
    spelling_answer,
)


def test_parse_word_query():
    p = parse_word_query("Hvernig skrifar maður Reykjavík?")
    assert p == {"op": "spelling", "word": "Reykjavík"}
    p = parse_word_query("hvernig er orðið kýr stafað")
    assert p == {"op": "spelling", "word": "kýr"}
    p = parse_word_query("Hvernig beygist orðið hestur?")
    assert p == {"op": "declension", "word": "hestur"}
    p = parse_word_query("hvernig á að fallbeygja köttur")
    assert p == {"op": "declension", "word": "köttur"}
    p = parse_word_query("hverjar eru beygingarmyndir orðsins bók")
    assert p == {"op": "declension", "word": "bók"}
    p = parse_word_query("Hvað þýðir orðið jafnrétti?")
    assert p == {"op": "dictionary", "word": "jafnrétti"}
    # multi-word dictionary subjects keep the first word
    p = parse_word_query("hvað merkir orðið heimspeki og fleira")
    assert p["word"] == "heimspeki"
    assert parse_word_query("hvernig líður þér") is None


def test_answer_builders():
    a = spelling_answer("kýr")
    assert a["answer"] == "K Ý R"
    a = declension_answer("hestur",
                          ("hestur", "hest", "hesti", "hests"))
    assert a["answer"] == "hestur, hest, hesti, hests"
    assert "Hér er hestur, um hest, frá hesti, til hests" in a["voice"]
    # the reference's not-in-BÍN wording
    a = declension_answer("blablabla", None)
    assert "fannst ekki í Beygingarlýsingu" in a["answer"]
    # one definition inline, several enumerated
    a = dictionary_answer("hestur", ["stórt spendýr af hestaætt"])
    assert a["answer"] == "„Hestur“ er „stórt spendýr af hestaætt“"
    a = dictionary_answer("klukka", ["tímamælir", "bjalla"])
    assert a["answer"] == "1. tímamælir\n2. bjalla."
    assert "í fyrsta lagi" in a["voice"]
    a = dictionary_answer("x", [])
    assert "Ekki tókst að fletta upp" in a["answer"]


def test_router_word_qtypes(spark, tmp_path):
    pages = spark.createDataFrame(generate_pages_pdf(60))
    store = build_index_checkpointed(
        spark, pages, str(tmp_path / "wrd"), n_shards=2, block_size=32
    )
    bin_forms = spark.createDataFrame(
        [("hestur", "hestur", "hest", "hesti", "hests")],
        "word string, nom string, acc string, dat string, gen string",
    )
    defs = spark.createDataFrame(
        [("klukka", "tímamælir", 1), ("klukka", "bjalla", 2)],
        "word string, definition string, ord int",
    )
    r = Router(spark, store, bin_forms=bin_forms,
               dictionary_defs=defs)
    a = r.execute("hvernig skrifar maður Akureyri")
    assert a.qtype == "Spelling"
    assert a.df.first()["answer"] == "A K U R E Y R I"
    b = r.execute("hvernig beygist orðið hestur")
    assert b.qtype == "Declension"
    assert b.df.first()["answer"] == "hestur, hest, hesti, hests"
    c = r.execute("hvernig beygist orðið snjór")
    assert "fannst ekki" in c.df.first()["answer"]
    d = r.execute("hvað þýðir orðið klukka")
    assert d.qtype == "Dictionary"
    assert d.df.first()["answer"] == "1. tímamælir\n2. bjalla."
    # without the dims, declension/dictionary fall through to search
    r2 = Router(spark, store)
    e = r2.execute("hvað þýðir orðið klukka")
    assert e.qtype == "Search"
    # spelling never needs a dim
    f = r2.execute("hvernig skrifar maður já")
    assert f.qtype == "Spelling"