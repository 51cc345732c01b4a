"""Solar-position layer: NOAA engine pins, cross-engine identity,
the sunpos qtype parser and both Router answer paths."""

import sys
from datetime import date
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from greynirserver_spark.corpus import generate_pages_pdf
from greynirserver_spark.functions.sun import (
    solar_columns,
    sun_select_items,
    sun_times_table,
)
from greynirserver_spark.plans.lineage import build_index_checkpointed
from greynirserver_spark.query.router import Router
from greynirserver_spark.query.sun import parse_sun_query


RVK = (64.133097, -21.898145)
GRIMSEY = (66.5422, -18.0107)


def _grid(spark, rows):
    df = spark.createDataFrame(
        rows, "place string, lat double, lon double, ds string"
    )
    return df.withColumn("d", F.col("ds").cast("date")).drop("ds")


def test_noaa_pinned_reykjavik(spark):
    """Computed sunrise/sunset vs the published Reykjavík almanac
    (almanak.is): 2026-01-01 ≈ 11:19/15:44 UTC, solstice ≈ 02:55 rise.
    The NOAA equations are good to ~1 min at this latitude."""
    out = {
        (r["place"], str(r["d"])): r
        for r in solar_columns(_grid(spark, [
            ("rvk", *RVK, "2026-01-01"),
            ("rvk", *RVK, "2026-06-21"),
        ])).collect()
    }
    jan = out[("rvk", "2026-01-01")]
    assert abs(jan["sunrise_utc_min"] - (11 * 60 + 19)) < 4
    assert abs(jan["sunset_utc_min"] - (15 * 60 + 44)) < 4
    assert jan["polar_day"] == 0 and jan["polar_night"] == 0
    assert 2.5 < jan["noon_elev_deg"] < 3.3
    jun = out[("rvk", "2026-06-21")]
    assert abs(jun["sunrise_utc_min"] - (2 * 60 + 55)) < 5
    # sets just past midnight UTC the next day
    assert 1440 < jun["sunset_utc_min"] < 1450
    assert 49.0 < jun["noon_elev_deg"] < 49.6


def test_polar_day_and_night_flags(spark):
    """Grímsey sits above the Arctic circle: midnight sun at the June
    solstice; at civil-twilight zenith (96°) December never brightens
    fully but the sun itself still rises (no polar night at 90.833°,
    Grímsey is only just above the circle)."""
    rows = solar_columns(_grid(spark, [
        ("g", *GRIMSEY, "2026-06-21"),
        ("g", *GRIMSEY, "2026-12-21"),
    ])).collect()
    bd = {str(r["d"]): r for r in rows}
    assert bd["2026-06-21"]["polar_day"] == 1
    assert bd["2026-06-21"]["daylight_min"] == 1440.0
    assert bd["2026-12-21"]["polar_day"] == 0
    # ~2h of sun at winter solstice on Grímsey
    assert 60 < bd["2026-12-21"]["daylight_min"] < 180


def test_cross_engine_round4_identity(spark):
    """The generated select items evaluate to round(,4)-identical
    doubles in Spark and DuckDB over the full driver grid (the libm
    implementations differ only at the last ulp)."""
    import duckdb

    import __spark_entry__ as entry

    sdf = entry._sun_times(spark).toPandas()
    ddf = duckdb.sql(entry._sun_oracle_sql()).df()
    cols = sorted(sdf.columns)
    assert cols == sorted(ddf.columns)
    s = sdf[cols].sort_values(["place", "d"]).reset_index(drop=True)
    o = ddf[cols].sort_values(["place", "d"]).reset_index(drop=True)
    assert len(s) == len(o) == 96
    for c in cols:
        assert list(s[c]) == list(o[c]), c


def test_sun_times_table_plan_broadcasts_spine(spark):
    """The grid must not be a P×Q cartesian: the date spine is
    broadcast so partitioning follows the places side."""
    places = _grid(spark, [("rvk", *RVK, "2026-01-01")]) \
        .select("place", "lat", "lon")
    dates = spark.createDataFrame(
        [("2026-01-01",), ("2026-06-21",)], "ds string"
    ).selectExpr("CAST(ds AS DATE) AS d")
    plan = sun_times_table(places, dates) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_parse_sun_query_variants():
    today = date(2026, 8, 17)
    p = parse_sun_query("Hvenær rís sólin?", today)
    assert p and p["position"] == "solris" and p["date"] == today
    assert p["place"] is None
    p = parse_sun_query("hvenær kemur sólin upp á morgun", today)
    assert p and p["position"] == "solris"
    assert p["date"] == date(2026, 8, 18) and p["when"] == "á morgun"
    assert p["place"] is None
    p = parse_sun_query("Hvenær settist sólin í gær?", today)
    assert p and p["position"] == "solarlag"
    assert p["date"] == date(2026, 8, 16) and p["when"] == "í gær"
    p = parse_sun_query("klukkan hvað er sólsetur í kvöld", today)
    assert p and p["position"] == "solarlag" and p["date"] == today
    p = parse_sun_query("hvenær rís sólin á Akureyri á morgun", today)
    assert p and p["place"] == "akureyri"
    p = parse_sun_query("hver er sólarhæðin í dag", today)
    assert p and p["position"] == "solarhaed"
    p = parse_sun_query("hvað er miðnætti", today)
    assert p and p["position"] == "midnaetti"
    # not sun queries
    assert parse_sun_query("hvað er 2 plús 2", today) is None
    assert parse_sun_query("sólin er gul", today) is None
    assert parse_sun_query("hvenær eru páskar", today) is None


@pytest.fixture(scope="module")
def sun_router_store(spark, tmp_path_factory):
    pages = spark.createDataFrame(generate_pages_pdf(60))
    root = str(tmp_path_factory.mktemp("sunr") / "store")
    return build_index_checkpointed(spark, pages, root, n_shards=2,
                                    block_size=32)


def test_router_sun_computed_path(spark, sun_router_store):
    """No almanac injected: the NOAA engine answers at Reykjavík
    (the reference's capital-region default)."""
    places = spark.createDataFrame(
        [("Reykjavík", *RVK), ("Akureyri", 65.6835, -18.1002)],
        "place string, lat double, lon double",
    )
    r = Router(spark, sun_router_store,
               clock=lambda: date(2026, 8, 17), places=places)
    a = r.execute("Hvenær rís sólin?")
    assert a.qtype == "SunPosition"
    row = a.df.first()
    assert row["city"] == "Reykjavík" and row["position"] == "solris"
    # mid-August Reykjavík sunrise ~05:00 UTC -> "í morgun" refinement
    assert row["answer"].startswith("Sólin rís um klukkan 5:")
    assert row["answer"].endswith("í morgun.")
    b = r.execute("hvenær sest sólin á morgun")
    assert b.df.first()["answer"].startswith("Sólin sest um klukkan 21:")
    c = r.execute("hvenær reis sólin í gær")
    assert c.df.first()["answer"].startswith("Sólin reis um klukkan 5:")
    # sun outranks the generic what-is
    d = r.execute("hvað er miðnætti")
    assert d.qtype == "SunPosition"
    assert "Miðnætti" in d.df.first()["answer"]
    # place resolution through the dim (genitive fold)
    e = r.execute("hvenær rís sólin á Akureyri")
    assert e.df.first()["city"] == "Akureyri"
    # sólarhæð answers in degrees
    h = r.execute("hver er sólarhæðin í dag")
    assert h.df.first()["answer"].startswith("Sólarhæð um hádegi í dag")
    assert "gráður" in h.df.first()["answer"]
    # almanac-only positions refuse without the dim
    g = r.execute("hvenær er birting í dag")
    assert g.qtype == "SunPosition" and g.df.count() == 0


def test_router_sun_almanac_path(spark, sun_router_store):
    """Injected almanac dim: nearest tabulated city, nearest tabulated
    date, derived solar midnight, and the empty-cell refusal wording
    (sunpos.py:482-485)."""
    alm_rows = []
    for d, ris, lag, had, myrk, haed in (
        ("2026-08-15", 330.0, 1290.0, 810.0, None, 40.9),
        ("2026-08-20", 345.0, 1275.0, 810.0, 1430.0, 39.2),
    ):
        alm_rows.append(("Reykjavík", RVK[0], RVK[1], d,
                         ris, lag, had, myrk, haed))
        alm_rows.append(("Akureyri", 65.6835, -18.1002, d,
                         ris - 10.0, lag + 10.0, 795.0, myrk, haed))
    alm = spark.createDataFrame(
        alm_rows,
        "city string, lat double, lon double, ds string, "
        "solris double, solarlag double, hadegi double, "
        "myrkur double, solarhaed double",
    ).withColumn("d", F.col("ds").cast("date")).drop("ds")
    r = Router(spark, sun_router_store,
               clock=lambda: date(2026, 8, 17), sun_almanac=alm)
    # default location = Reykjavík -> nearest city Reykjavík; the
    # 15th is the nearest tabulated date to the 17th
    a = r.execute("hvenær rís sólin").df.first()
    assert a["city"] == "Reykjavík" and a["d"] == "2026-08-15"
    assert a["value"] == 330.0
    assert a["answer"] == "Sólin rís um klukkan 5:30 í morgun."
    # derived midnight = (hádegi + 720) % 1440 -> 1:30, í nótt
    m = r.execute("hvenær er miðnætti").df.first()
    assert m["answer"] == "Miðnætti verður um klukkan 1:30 í nótt."
    # empty almanac cell -> the reference's refusal wording
    k = r.execute("hvenær er myrkur í dag").df.first()
    assert k["answer"] == "Það verður ekki myrkur í dag."
    # past tense for yesterday
    y = r.execute("hvenær settist sólin í gær").df.first()
    assert y["answer"].startswith("Sólin settist um klukkan 21:30")
