"""Date qtype: calendar semantics vs the reference's date module."""

import sys
from datetime import date
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from greynirserver_spark.query.dates import calc_easter, parse_date_query

NOW = date(2026, 8, 17)  # a Monday


def test_easter_computus_known_years():
    # published Western Easter dates
    assert calc_easter(2024) == date(2024, 3, 31)
    assert calc_easter(2025) == date(2025, 4, 20)
    assert calc_easter(2026) == date(2026, 4, 5)
    assert calc_easter(2030) == date(2030, 4, 21)


def test_current_date_and_year():
    r = parse_date_query("Hvaða dagur er í dag?", NOW)
    assert r["target"] == "2026-08-17" and "mánudagur" in r["answer"]
    r = parse_date_query("hvaða dagur er á morgun", NOW)
    assert r["target"] == "2026-08-18" and "þriðjudagur" in r["answer"]
    r = parse_date_query("Hvaða ár er núna?", NOW)
    assert r["value"] == 2026.0


def test_leap_year_rule():
    assert parse_date_query("Er 2028 hlaupár?", NOW)["value"] == 1.0
    assert parse_date_query("er árið 2026 hlaupár", NOW)["value"] == 0.0
    # Gregorian century rule
    assert parse_date_query("er árið 1900 hlaupár", NOW)["value"] == 0.0
    assert parse_date_query("er árið 2000 hlaupár", NOW)["value"] == 1.0


def test_movable_feasts_are_easter_offsets():
    # next Easter from Aug 2026 is 2027-03-28
    assert parse_date_query(
        "Hvenær eru páskar?", NOW)["target"] == "2027-03-28"
    # reference offsets: +49 hvítasunna, +39 uppstigning, -46 öskudagur
    assert parse_date_query(
        "hvenær er hvítasunna", NOW)["target"] == "2027-05-16"
    assert parse_date_query(
        "Hvenær er uppstigningardagur?", NOW)["target"] == "2027-05-06"
    assert parse_date_query(
        "hvenær er öskudagur", NOW)["target"] == "2027-02-10"
    # explicit year overrides "next"
    assert parse_date_query(
        "Hvenær eru páskar árið 2030?", NOW)["target"] == "2030-04-21"


def test_fixed_holidays_next_occurrence():
    assert parse_date_query(
        "hvenær er þorláksmessa", NOW)["target"] == "2026-12-23"
    # þjóðhátíðardagurinn already passed in 2026 -> next year
    assert parse_date_query(
        "hvenær er þjóðhátíðardagurinn", NOW)["target"] == "2027-06-17"
    # first Thursday after April 18
    assert parse_date_query(
        "hvenær er sumardagurinn fyrsti", NOW)["target"] == "2027-04-22"


def test_days_until():
    r = parse_date_query("Hvað er langt til jóla?", NOW)
    assert r["value"] == float((date(2026, 12, 25) - NOW).days)
    r = parse_date_query("Hvað eru margir dagar til 17. júní?", NOW)
    assert r["target"] == "2027-06-17"
    # target today
    r = parse_date_query("hvað er langt til 17. ágúst", NOW)
    assert r["value"] == 0.0 and "í dag" in r["answer"]


def test_non_date_falls_through():
    assert parse_date_query("Hvað er 5 sinnum 7?", NOW) is None
    assert parse_date_query("hver er Jón?", NOW) is None
