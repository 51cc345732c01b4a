"""Geography, currency and clock qtypes: parsers and Router paths."""

import sys
from datetime import date, datetime, timezone
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from greynirserver_spark.corpus import generate_pages_pdf
from greynirserver_spark.plans.lineage import build_index_checkpointed
from greynirserver_spark.query.clock import parse_clock_query
from greynirserver_spark.query.currency import (
    compute_currency,
    iceformat_float,
    is_plural_isk,
    parse_currency_query,
)
from greynirserver_spark.query.geography import parse_geo_query
from greynirserver_spark.query.router import Router


# ------------------------------------------------------------ parsers

def test_parse_geo_query():
    p = parse_geo_query("Hver er höfuðborg Frakklands?")
    assert p == {"op": "capital", "subject": "Frakklands"}
    p = parse_geo_query("í hvaða landi er París")
    assert p == {"op": "country_of", "subject": "París"}
    p = parse_geo_query("Í hvaða heimsálfu er Japan?")
    assert p == {"op": "continent_of", "subject": "Japan"}
    p = parse_geo_query("hvar er Þýskaland")
    assert p == {"op": "where_is", "subject": "Þýskaland"}
    assert parse_geo_query("hvað er 2 plús 2") is None


def test_parse_currency_query():
    p = parse_currency_query("Hvert er gengi dollarans?")
    assert p["op"] == "general" and p["c1"] == "USD"
    p = parse_currency_query("hvert er gengi evru gagnvart dollara")
    assert p["op"] == "exchange" and (p["c1"], p["c2"]) == \
        ("EUR", "USD")
    p = parse_currency_query("Hvað eru 100 evrur margar krónur?")
    assert p["op"] == "convert" and p["amount"] == 100.0
    assert (p["c1"], p["c2"]) == ("EUR", "ISK")
    p = parse_currency_query("hvert er gengi danskrar krónu")
    assert p["c1"] == "DKK"
    p = parse_currency_query("hver er gengisvísitalan")
    assert p["op"] == "index"
    assert parse_currency_query("hvert er gengi hamingjunnar") is None


def test_currency_arithmetic_and_format():
    rates = {"EUR": 152.4, "USD": 139.8, "DKK": 20.43, "GVT": 196.5}
    # general: EUR -> ISK
    assert compute_currency("general", "EUR", "ISK", None,
                            rates) == 152.4
    # exchange goes through the ISK base (currency.py:262-263)
    v = compute_currency("exchange", "EUR", "USD", None, rates)
    assert abs(v - 152.4 / 139.8) < 1e-12
    # a currency is always worth 1 of itself (currency.py:248-250)
    assert compute_currency("exchange", "USD", "USD", None,
                            rates) == 1.0
    # convert multiplies the amount
    v = compute_currency("convert", "EUR", "ISK", 100.0, rates)
    assert v == 15240.0
    # unknown currency -> None (refusal)
    assert compute_currency("general", "XXX", "ISK", None,
                            rates) is None
    # Icelandic number format: thousands '.', decimal ','
    assert iceformat_float(15240.0) == "15.240"
    assert iceformat_float(1.0903) == "1,09"
    assert iceformat_float(152.4) == "152,4"
    # singular for -1 endings except 11 (is_plural)
    assert not is_plural_isk(1)
    assert not is_plural_isk(21)
    assert is_plural_isk(11)
    assert is_plural_isk(152.4)


def test_parse_clock_query():
    assert parse_clock_query("Hvað er klukkan?") == {"loc": None}
    assert parse_clock_query("hvað er klukkan í Tokyo") == \
        {"loc": "Tokyo"}
    assert parse_clock_query("hvað er langt til jóla") is None


# ------------------------------------------------------- Router paths

@pytest.fixture(scope="module")
def world_router(spark, tmp_path_factory):
    pages = spark.createDataFrame(generate_pages_pdf(60))
    root = str(tmp_path_factory.mktemp("world") / "store")
    store = build_index_checkpointed(spark, pages, root, n_shards=2,
                                     block_size=32)
    countries = spark.createDataFrame(
        [("FR", "Frakkland", "Frakklands", "í Frakklandi",
          "París", "Evrópa", "Evrópu"),
         ("DE", "Þýskaland", "Þýskalands", "í Þýskalandi",
          "Berlín", "Evrópa", "Evrópu"),
         ("JP", "Japan", "Japans", "í Japan",
          "Tókýó", "Asía", "Asíu")],
        "cc string, country string, country_gen string, "
        "country_loc string, capital string, continent string, "
        "continent_dat string",
    )
    places = spark.createDataFrame(
        [("París", 48.8566, 2.3522, "FR"),
         ("Hamborg", 53.5507, 9.993, "DE")],
        "place string, lat double, lon double, country string",
    )
    rates = spark.createDataFrame(
        [("EUR", 152.4), ("USD", 139.8), ("GVT", 196.5)],
        "cc string, rate_isk double",
    )
    tzs = spark.createDataFrame(
        [("Tokyo", 540), ("New York", -240)],
        "city string, utc_offset_min int",
    )
    return Router(
        spark, store,
        clock=lambda: date(2026, 8, 17),
        now=lambda: datetime(2026, 8, 17, 14, 30,
                             tzinfo=timezone.utc),
        countries=countries, places=places, exchange_rates=rates,
        timezones=tzs,
    )


def test_router_geography(world_router):
    a = world_router.execute("Hver er höfuðborg Frakklands?")
    assert a.qtype == "Geography"
    row = a.df.first()
    assert row["answer"] == "París"
    assert row["voice"] == "Höfuðborg Frakklands er París."
    b = world_router.execute("í hvaða landi er Hamborg")
    assert b.df.first()["answer"] == "Í Þýskalandi."
    c = world_router.execute("í hvaða heimsálfu er Japan")
    assert c.df.first()["answer"] == "Evrópu" or \
        c.df.first()["answer"] == "Asíu"
    assert c.df.first()["answer"] == "Asíu"
    # placename continent: country + continent (geography.py:214-219)
    d = world_router.execute("í hvaða heimsálfu er París")
    assert d.df.first()["answer"] == "Í Frakklandi, Evrópu"
    e = world_router.execute("hvar er Þýskaland")
    assert e.df.first()["answer"] == "Þýskaland er land í Evrópu."
    # unresolved subject falls through to search, not an empty answer
    f = world_router.execute("hvar er hamingjan")
    assert f.qtype == "Search"


def test_router_currency(world_router):
    a = world_router.execute("Hvert er gengi evru?")
    assert a.qtype == "Currency"
    row = a.df.first()
    assert row["answer"] == "152,4 krónur"
    b = world_router.execute("hvað eru 100 evrur margar krónur")
    assert b.df.first()["answer"] == "15.240 krónur"
    assert b.df.first()["voice"] == "100 EUR eru 15.240 krónur."
    c = world_router.execute("hvert er gengi evru gagnvart dollara")
    assert c.df.first()["answer"] == iceformat_float(152.4 / 139.8)
    d = world_router.execute("hver er gengisvísitalan")
    assert d.df.first()["answer"] == "196,5"
    # unknown currency in the dim -> 0 rows (refusal)
    e = world_router.execute("hvert er gengi júans")
    assert e.qtype == "Currency" and e.df.count() == 0


def test_router_clock(world_router):
    a = world_router.execute("Hvað er klukkan?")
    assert a.qtype == "Time"
    assert a.df.first()["answer"] == "14:30"
    assert a.df.first()["voice"] == "Klukkan er 14:30."
    b = world_router.execute("hvað er klukkan í Tokyo")
    assert b.df.first()["answer"] == "23:30"
    assert b.df.first()["voice"] == "Klukkan í Tokyo er 23:30."
    # unknown city falls through to search rather than guessing
    c = world_router.execute("hvað er klukkan í Hvergi")
    assert c.qtype == "Search"