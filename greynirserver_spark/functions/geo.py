"""Geo scalar functions + placename tagging — brings the reference's
geo layer in scope as column expressions.

Reference behaviors re-expressed (semantics only, public spherical
trigonometry):
* ``haversine_km`` — great-circle distance, the reference's
  `geo.py::distance` (standard haversine, R=6371 km; its docstring's
  Munich→Berlin example, 504.2 km, is pinned in tests here).
* ``in_iceland`` — `geo.py::in_iceland`: within *km_radius* (default
  300) of the island centroid (64.9957538607, -18.5739616708).
* ``near_capital_region`` — `geo.py::near_capital_region`: strictly
  within 30 km of central Reykjavík (64.133097, -21.898145).
* ``geo_tag_documents`` — the lookup the reference does per-article
  against its placename JSON resources (`geo.py::lookup_city_info`,
  `iceloc`): here a broadcast join of the corpus token stream against a
  places dimension (place, lat, lon, country). The dimension is tiny
  (10^4-10^5 places) next to any corpus, so the join never shuffles the
  token stream; tagging is map-side at scan speed.

All pure column expressions (JVM sin/cos/asin — IEEE doubles, identical
in DuckDB), so every function is oracle-checkable with `round(x, 4)`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = [
    "haversine_km",
    "in_iceland",
    "near_capital_region",
    "geo_tag_documents",
    "ICELAND_COORDS",
    "RVK_COORDS",
]

EARTH_RADIUS_KM = 6371.0
ICELAND_COORDS = (64.9957538607, -18.5739616708)
RVK_COORDS = (64.133097, -21.898145)


def haversine_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in km (haversine, R=6371)."""
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = (
        F.sin(dlat / 2) * F.sin(dlat / 2)
        + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2))
        * F.sin(dlon / 2) * F.sin(dlon / 2)
    )
    return F.lit(2 * EARTH_RADIUS_KM) * F.asin(F.sqrt(a))


def in_iceland(lat: Column, lon: Column, km_radius: float = 300.0) -> Column:
    """True within *km_radius* of the Iceland centroid (<=, as the
    reference)."""
    return haversine_km(
        lat, lon, F.lit(ICELAND_COORDS[0]), F.lit(ICELAND_COORDS[1])
    ) <= F.lit(km_radius)


def near_capital_region(lat: Column, lon: Column, km_radius: float = 30.0) -> Column:
    """True strictly within *km_radius* of central Reykjavík (<, as the
    reference)."""
    return haversine_km(
        lat, lon, F.lit(RVK_COORDS[0]), F.lit(RVK_COORDS[1])
    ) < F.lit(km_radius)


def geo_tag_documents(docs: DataFrame, places: DataFrame) -> DataFrame:
    """(doc_id, place, n_mentions, lat, lon, country, dist_rvk_km,
    in_iceland): every (document, place) mention pair with the place's
    coordinates, its rounded distance from Reykjavík and the
    in-Iceland flag. *places* must have (place, lat, lon, country) with
    lower-cased single-token place names; it is broadcast.
    """
    from ..tokenization import MAX_WORD_LEN, TOKEN_SPLIT_RE

    toks = (
        docs.select(
            "doc_id",
            F.explode(F.split(F.lower("text"), TOKEN_SPLIT_RE)).alias("place"),
        )
        .where((F.length("place") >= 1) & (F.length("place") <= MAX_WORD_LEN))
    )
    return (
        toks.join(F.broadcast(places), "place")
        .groupBy("doc_id", "place", "lat", "lon", "country")
        .agg(F.count("*").cast("long").alias("n_mentions"))
        .select(
            "doc_id", "place", "n_mentions", "lat", "lon", "country",
            F.round(
                haversine_km(
                    F.col("lat"), F.col("lon"),
                    F.lit(RVK_COORDS[0]), F.lit(RVK_COORDS[1]),
                ), 4,
            ).alias("dist_rvk_km"),
            in_iceland(F.col("lat"), F.col("lon")).cast("long")
            .alias("in_iceland"),
        )
    )
