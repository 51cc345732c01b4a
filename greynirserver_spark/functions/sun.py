"""Solar-position layer — the reference's sunrise/sunset qtype
(`/root/reference/queries/sunpos.py`) re-expressed as column math.

The reference scrapes the Almanak HÍ table (an external endpoint,
sunpos.py:219-341: city rows with DMS coords, per-date rows with nine
solar-position columns) and answers from the nearest tabulated city and
date.  An external scrape cannot be the engine of record at 10^12 rows,
and the reference's own TODO calls the table inaccurate — so here the
engine COMPUTES solar positions from the standard NOAA solar-calculator
equations (public astronomy: Meeus via the NOAA spreadsheet), and the
almanac survives only as an optional injectable dimension on the Router
(reference-parity lookup path, `query/router.py::sun_answer`).

Scale design: the whole derivation is ONE generated SELECT list of
plain arithmetic + trigonometry — no UDF, no shuffle, no state.  Over a
(place × date) grid of any size it is an embarrassingly parallel
map at scan speed inside WholeStageCodegen.  The SELECT items are
plain SQL text consumed verbatim by BOTH Spark (``selectExpr`` with
lateral column aliases) and the DuckDB oracle, so the two engines
evaluate operand-order-identical IEEE-double expressions — the same
trick the geo layer uses for its haversine oracle.

Outputs per (lat, lon, date), all UTC (Iceland runs UTC year-round):
declination, equation of time, solar noon / sunrise / sunset minutes,
daylight minutes, solar-noon elevation, polar day/night flags — the
reference's MIÐNÆTTI/SÓLRIS/HÁDEGI/SÓLARLAG/SÓLARHÆÐ columns
(sunpos.py:128-138; MIÐNÆTTI is noon ± 720 as sunpos.py:322-328).
"""

from __future__ import annotations

from typing import List

from pyspark.sql import DataFrame, functions as F

__all__ = [
    "SUN_OUTPUT_COLUMNS",
    "sun_select_items",
    "solar_columns",
    "sun_times_table",
]

# Sunrise/sunset zenith: 90° + atmospheric refraction 0.833° (NOAA).
_ZENITH = "90.833"

SUN_OUTPUT_COLUMNS = [
    "decl_deg",
    "eot_min",
    "noon_utc_min",
    "sunrise_utc_min",
    "sunset_utc_min",
    "midnight_utc_min",
    "daylight_min",
    "noon_elev_deg",
    "polar_day",
    "polar_night",
]


def sun_select_items(days: str = "days", lat: str = "lat",
                     lon: str = "lon", zenith: str = _ZENITH) -> List[str]:
    """The NOAA solar-position derivation as an ordered list of
    ``expr AS name`` SQL items.

    *days* is a column holding DOUBLE days since 2000-01-01 (so the
    Julian day at 12:00 UT is 2451545.0 + days — the NOAA spreadsheet's
    local-noon convention at tz=0).  Later items reference earlier
    aliases (lateral column aliases — supported identically by Spark
    ≥3.4 and DuckDB), which keeps every intermediate written exactly
    once so both engines parse the very same operand tree.
    """
    return [
        # Julian century
        f"(({days}) / 36525.0) AS jc",
        # geometric mean longitude / anomaly of the sun (degrees)
        "(280.46646 + jc * (36000.76983 + jc * 0.0003032)) - 360.0 * "
        "floor((280.46646 + jc * (36000.76983 + jc * 0.0003032)) / 360.0)"
        " AS gml",
        "357.52911 + jc * (35999.05029 - 0.0001537 * jc) AS gma",
        # orbital eccentricity
        "0.016708634 - jc * (0.000042037 + 0.0000001267 * jc) AS ecc",
        # equation of center -> sun true/apparent longitude (degrees)
        "sin(radians(gma)) * (1.914602 - jc * (0.004817 + 0.000014 * jc))"
        " + sin(radians(2.0 * gma)) * (0.019993 - 0.000101 * jc)"
        " + sin(radians(3.0 * gma)) * 0.000289 AS eqc",
        "gml + eqc AS stl",
        "stl - 0.00569 - 0.00478 * sin(radians(125.04 - 1934.136 * jc))"
        " AS sal",
        # mean obliquity of the ecliptic + nutation correction (degrees)
        "23.0 + (26.0 + (21.448 - jc * (46.815 + jc * (0.00059"
        " - jc * 0.001813))) / 60.0) / 60.0 AS moe",
        "moe + 0.00256 * cos(radians(125.04 - 1934.136 * jc)) AS oc",
        # solar declination (degrees)
        "degrees(asin(sin(radians(oc)) * sin(radians(sal)))) AS decl_deg",
        # equation of time (minutes)
        "tan(radians(oc / 2.0)) * tan(radians(oc / 2.0)) AS vary",
        "4.0 * degrees(vary * sin(2.0 * radians(gml))"
        " - 2.0 * ecc * sin(radians(gma))"
        " + 4.0 * ecc * vary * sin(radians(gma)) * cos(2.0 * radians(gml))"
        " - 0.5 * vary * vary * sin(4.0 * radians(gml))"
        " - 1.25 * ecc * ecc * sin(2.0 * radians(gma))) AS eot_min",
        # hour angle of sunrise; |cosha| > 1 means the sun never crosses
        # the horizon that day (polar day/night)
        f"cos(radians({zenith})) / (cos(radians({lat})) *"
        f" cos(radians(decl_deg)))"
        f" - tan(radians({lat})) * tan(radians(decl_deg)) AS cosha",
        "CASE WHEN cosha < -1.0 THEN 1 ELSE 0 END AS polar_day",
        "CASE WHEN cosha > 1.0 THEN 1 ELSE 0 END AS polar_night",
        "degrees(acos(least(1.0, greatest(-1.0, cosha)))) AS ha_deg",
        # clock times as minutes after 00:00 UTC
        f"720.0 - 4.0 * ({lon}) - eot_min AS noon_utc_min",
        "noon_utc_min - 4.0 * ha_deg AS sunrise_utc_min",
        "noon_utc_min + 4.0 * ha_deg AS sunset_utc_min",
        # solar midnight (sunpos.py:322-328 derives it from noon)
        "noon_utc_min - 720.0 AS midnight_utc_min",
        "8.0 * ha_deg AS daylight_min",
        # elevation at solar noon = 90 - |lat - decl| (SÓLARHÆÐ)
        f"90.0 - abs(({lat}) - decl_deg) AS noon_elev_deg",
    ]


def solar_columns(df: DataFrame, date_col: str = "d", lat_col: str = "lat",
                  lon_col: str = "lon", zenith: str = _ZENITH) -> DataFrame:
    """Append the solar-position columns to *df*.

    Pure narrow projection — no shuffle, no UDF; the entire derivation
    stays inside one WholeStageCodegen stage at any scale.
    """
    days = (
        f"CAST(datediff({date_col}, DATE '2000-01-01') AS DOUBLE)"
        " AS __sun_days"
    )
    out = df.selectExpr("*", days).selectExpr(
        "*", *sun_select_items(days="__sun_days",
                               lat=lat_col, lon=lon_col, zenith=zenith)
    )
    drop = ["__sun_days", "jc", "gml", "gma", "ecc", "eqc", "stl", "sal",
            "moe", "oc", "vary", "cosha", "ha_deg"]
    return out.drop(*drop)


def sun_times_table(places: DataFrame, dates: DataFrame,
                    date_col: str = "d") -> DataFrame:
    """Solar positions for every (place, date) pair.

    *places* carries (place, lat, lon); *dates* one DATE column.  The
    spine is broadcast so the grid's partitioning follows the places
    side (a plain cartesian would multiply task counts, P×Q); even a
    10^5-place × 365-day grid is only 10^7 independent rows, an
    embarrassingly parallel map."""
    return solar_columns(places.crossJoin(F.broadcast(dates)),
                         date_col=date_col)
