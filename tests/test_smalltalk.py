"""Counting, random, parrot, telephone and Yule-lads qtypes."""

import random
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from greynirserver_spark.corpus import generate_pages_pdf
from greynirserver_spark.plans.lineage import build_index_checkpointed
from greynirserver_spark.query.router import Router
from greynirserver_spark.query.smalltalk import (
    answer_random,
    parse_counting_query,
    parse_random_query,
    parse_repeat_query,
    parse_tel_query,
    parse_yulelads_query,
)


def test_parse_counting():
    p = parse_counting_query("Teldu upp að 10")
    assert (p["first"], p["last"], p["answer"]) == (1, 10, "1…10")
    # counting down from N starts at N-1 (range(0,n)[::-1])
    p = parse_counting_query("teldu niður frá 10")
    assert (p["first"], p["last"]) == (9, 0)
    p = parse_counting_query("teldu frá 7 upp að 12")
    assert (p["first"], p["last"]) == (7, 12)
    # the reference's 100-number cap -> refusal wording
    p = parse_counting_query("teldu upp að 5000")
    assert p["answer"] == "Ég nenni ekki að telja svona lengi."
    assert parse_counting_query("teldu kindurnar") is None


def test_parse_and_answer_random():
    rng = random.Random(42)
    p = parse_random_query("Veldu tölu á milli 5 og 10")
    assert (p["num1"], p["num2"]) == (5, 10)
    a = answer_random(p, rng)
    assert 5 <= int(a["answer"]) <= 10
    assert a["qkey"] == "5-10"
    # reversed bounds are sorted (rand.py:110-111)
    p = parse_random_query("veldu tölu milli 10 og 5")
    assert (p["num1"], p["num2"]) == (5, 10)
    p = parse_random_query("kastaðu teningi")
    assert (p["num1"], p["num2"]) == (1, 6)
    a = answer_random(p, rng)
    assert 1 <= int(a["answer"]) <= 6
    assert "á teningnum" in a["voice"]
    # zero-sided die refusal (rand.py:113-115)
    p = parse_random_query("kastaðu 0 hliða teningi")
    a = answer_random(p, rng)
    assert a["answer"] == "Núll hliða teningar eru ekki til."
    # coin flip
    p = parse_random_query("fiskur eða skjaldarmerki")
    a = answer_random(p, rng)
    assert a["answer"] in ("Fiskur", "Skjaldarmerki")
    assert parse_random_query("veldu lið") is None


def test_parse_repeat():
    p = parse_repeat_query("endurtaktu góðan daginn")
    assert p["answer"] == "Góðan daginn"
    p = parse_repeat_query("Segðu setninguna þetta er próf?")
    assert p["answer"] == "Þetta er próf"
    assert parse_repeat_query("endurtaktu") is None
    assert parse_repeat_query("segðu mér sögu") is None


def test_parse_tel():
    p = parse_tel_query("Hringdu í 588 5522")
    assert p["number"] == "5885522"
    assert p["answer"] == "Skal gert" and p["url"] == "tel:5885522"
    p = parse_tel_query("nennirðu að hringja í símanúmerið 112")
    assert p["url"] == "tel:112"
    # under 3 digits is invalid (tel.py:216-217)
    p = parse_tel_query("hringdu í 12")
    assert p["url"] is None and "ekki gilt símanúmer" in p["answer"]
    assert parse_tel_query("hringdu í mömmu") is None


def test_parse_yulelads():
    p = parse_yulelads_query("Hvenær kemur Askasleikir?")
    assert p["answer"] == \
        "Askasleikir kemur til byggða aðfaranótt 17. desember."
    # name variant (Pottaskefill == Pottasleikir's day)
    p = parse_yulelads_query("hvenær er von á Pottaskefill")
    assert "16. desember" in p["answer"]
    p = parse_yulelads_query("hvenær kemur fyrsti jólasveinninn")
    assert "Stekkjarstaur" in p["answer"] and "12." in p["answer"]
    p = parse_yulelads_query("hvaða jólasveinn kemur 15. desember")
    assert p["answer"] == \
        "Þvörusleikir kemur til byggða aðfaranótt 15. desember."
    p = parse_yulelads_query(
        "hvaða jólasveinn kemur fimmtánda desember")
    assert "Þvörusleikir" in p["answer"]
    # a December day outside 12-24 has no lad
    p = parse_yulelads_query("hvaða jólasveinn kemur 5. desember")
    assert p["answer"] == \
        "Enginn jólasveinn kemur til byggða þann 5. desember."
    # invalid day-of-month
    p = parse_yulelads_query("hvaða jólasveinn kemur 45. desember")
    assert p["answer"] == "Þetta er ekki gildur mánaðardagur."
    assert parse_yulelads_query("hvenær kemur strætó") is None


def test_router_smalltalk_dispatch(spark, tmp_path):
    pages = spark.createDataFrame(generate_pages_pdf(60))
    store = build_index_checkpointed(
        spark, pages, str(tmp_path / "smt"), n_shards=2, block_size=32
    )
    r = Router(spark, store, rng=random.Random(7))
    a = r.execute("teldu upp að 5")
    assert a.qtype == "Counting"
    assert a.df.first()["answer"] == "1…5"
    b = r.execute("kastaðu teningi")
    assert b.qtype == "Random"
    assert 1 <= int(b.df.first()["answer"]) <= 6
    c = r.execute("endurtaktu allt gengur vel")
    assert c.qtype == "Parrot"
    assert c.df.first()["answer"] == "Allt gengur vel"
    d = r.execute("hringdu í 588 5522")
    assert d.qtype == "Telephone"
    assert d.df.first()["url"] == "tel:5885522"
    e = r.execute("hvenær kemur Giljagaur")
    assert e.qtype == "YuleLads"
    assert "13. desember" in e.df.first()["answer"]
    # the sun qtype still wins "hvenær kemur sólin upp"
    f = r.execute("hvenær kemur sólin upp")
    assert f.qtype == "SunPosition"


def test_router_special_responses(spark, tmp_path):
    """Canned answers (the reference's special/opinion dict) win
    before every other matcher, on the lowercased '?'-stripped
    query."""
    pages = spark.createDataFrame(generate_pages_pdf(60))
    store = build_index_checkpointed(
        spark, pages, str(tmp_path / "spc"), n_shards=2, block_size=32
    )
    canned = spark.createDataFrame(
        [("hver bjó þig til", "Verkfræðingar smíðuðu mig."),
         ("teldu upp að 5", "Þessu svara ég ekki.")],
        "q string, answer string",
    )
    r = Router(spark, store, special_responses=canned)
    a = r.execute("Hver bjó þig til?")
    assert a.qtype == "Special"
    assert a.df.first()["answer"] == "Verkfræðingar smíðuðu mig."
    # special outranks even the counting matcher (reference
    # handle_plain_text order)
    b = r.execute("teldu upp að 5")
    assert b.qtype == "Special"
    # non-canned queries flow through unchanged
    c = r.execute("teldu upp að 7")
    assert c.qtype == "Counting"