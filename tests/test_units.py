"""Unit-conversion qtype: reference factors and declension surface."""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from greynirserver_spark.query.units import parse_unit_query


def test_reference_factors():
    # pund = 0.454 kg (reference unit.py:125 — deliberately rounded)
    r = parse_unit_query("Hvað eru 5 kíló í pundum?")
    assert r["value"] == pytest.approx(5 / 0.454)
    # míla = 1609 m (reference rounding, not 1609.344)
    r = parse_unit_query("Hvað er 1 míla í kílómetrum?")
    assert r["value"] == pytest.approx(1.609)
    # fet = 0.305 m
    assert parse_unit_query(
        "Hvað eru 100 fet í metrum?")["value"] == pytest.approx(30.5)


def test_both_question_shapes_and_number_words():
    a = parse_unit_query("hvað er einn kílómetri í metrum")
    b = parse_unit_query("Hversu margir metrar eru í einum kílómetra?")
    assert a["value"] == b["value"] == 1000.0
    assert parse_unit_query(
        "hvað eru tvær vikur í dögum")["value"] == 14.0


def test_cross_dimension_refusal():
    r = parse_unit_query("Hvað eru 5 kíló í metrum?")
    assert r["value"] is None and "eininga" in r["answer"]


def test_plural_singular_answer_forms():
    assert parse_unit_query(
        "hvað eru 2 lítrar í millilítrum")["answer"] \
        == "2 lítrar eru 2000 millilítrar."
    assert parse_unit_query(
        "hvað er einn kílómetri í metrum")["answer"].startswith(
            "1 kílómetri er ")


def test_non_unit_falls_through():
    assert parse_unit_query("Hvað er 5 sinnum 7?") is None
    assert parse_unit_query("hvenær eru páskar") is None
