"""Arithmetic qtype: parser semantics vs the reference's calc rules."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from greynirserver_spark.query.arithmetic import (
    iceformat_number,
    parse_arithmetic,
)


def test_std_operators():
    assert parse_arithmetic("Hvað er 5 sinnum 7?")["value"] == 35.0
    assert parse_arithmetic("Hvað er 10 plús 4?")["value"] == 14.0
    assert parse_arithmetic("Hvað er 10 mínus 4?")["value"] == 6.0
    assert parse_arithmetic("Hvað er 10 deilt með 4?")["value"] == 2.5
    assert parse_arithmetic("hvað er 3 + 4")["value"] == 7.0


def test_number_words_and_inflections():
    # the reference parses number words through its grammar
    # (arithmetic.py:102-264); the regex subset covers the word chains
    assert parse_arithmetic(
        "hvað eru sautján sinnum þrjátíu og fjórir")["value"] == 578.0
    assert parse_arithmetic(
        "Hvað eru þrjú hundruð sinnum tvö?")["value"] == 600.0
    assert parse_arithmetic(
        "Hvað eru tvær milljónir deilt með fjórum?")["value"] == 500000.0


def test_division_by_zero_refusal():
    r = parse_arithmetic("Hvað er 10 deilt með 0?")
    assert r["value"] is None and "núlli" in r["answer"]


def test_sqrt_rounds_to_two_decimals():
    # reference: round(math.sqrt(x), 2), arithmetic.py:507
    r = parse_arithmetic("Hver er kvaðratrótin af tuttugu?")
    assert r["value"] == 4.47


def test_pow_cap_and_percent_and_vat():
    assert parse_arithmetic("Hvað er 2 í 10 veldi?")["value"] == 1024.0
    assert parse_arithmetic("Hvað er 2 í 100 veldi?")["value"] is None
    assert parse_arithmetic(
        "Hvað eru níu prósent af tvö þúsund")["value"] == 180.0
    # VAT multiplier 1.24, arithmetic.py:470
    assert parse_arithmetic("Hvað er 1000 með vsk?")["value"] == 1240.0
    assert parse_arithmetic(
        "Hvað er 1240 án virðisaukaskatti?")["value"] == 1000.0


def test_decimal_comma_and_negatives():
    assert parse_arithmetic("Hvað er 3,5 plús 1,25?")["value"] == 4.75
    assert parse_arithmetic("Hvað er mínus 5 plús 7?")["value"] == 2.0


def test_non_arithmetic_falls_through():
    assert parse_arithmetic("Hvað er þetta eiginlega?") is None
    assert parse_arithmetic("Hver er Jón Jónsson?") is None
    assert parse_arithmetic("nýjustu greinar") is None


def test_iceformat():
    assert iceformat_number(35.0) == "35"
    assert iceformat_number(2.5) == "2,5"
