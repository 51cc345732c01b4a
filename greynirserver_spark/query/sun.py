"""Sunrise/sunset qtype — the reference's SunPosition module
(`/root/reference/queries/sunpos.py`), Spark-side.

The reference parses "hvenær rís sólin á morgun?"-class queries with
its Earley grammar, scrapes the Almanak HÍ solar table, picks the
tabulated city nearest the user (sunpos.py:381-395) and the tabulated
date nearest the asked date (sunpos.py:398-404), and formats a tensed
Icelandic answer (sunpos.py:397-489).

Here the grammar layer is the same plain-keyword matcher the other
offline qtypes use, and the data layer is either

* an injectable almanac dimension (reference-parity lookup: nearest
  city by the geo layer's haversine, nearest date relationally), or
* the computed NOAA engine (`functions/sun.py`) when no almanac is
  injected — sólris/sólarlag/hádegi/miðnætti/sólarhæð exactly, plus
  dögun/myrkur at the civil-twilight depression (96° zenith; the
  almanac's own birting/dagsetur thresholds are table-defined, so
  those two answer only from the injected dimension).

Answer strings mirror the reference's tense logic: "Sólin reis/rís um
klukkan H:MM í gær/í dag/á morgun." with the í nótt/í morgun/í kvöld
refinement for today (sunpos.py:444-455), "Það varð/verður ekki X"
for absent almanac cells (sunpos.py:482-485), and the gráða/gráður
singular/plural fold for sólarhæð (sunpos.py:428-436).
"""

from __future__ import annotations

import datetime
import re
from typing import Optional

__all__ = ["parse_sun_query", "POSITION_WORDS", "format_sun_answer"]

# position key -> (display word, almanac column)
POSITION_WORDS = {
    "solris": ("Sólris", "solris"),
    "solarlag": ("Sólarlag", "solarlag"),
    "hadegi": ("Hádegi", "hadegi"),
    "midnaetti": ("Miðnætti", "midnaetti"),
    "dogun": ("Dögun", "dogun"),
    "birting": ("Birting", "birting"),
    "myrkur": ("Myrkur", "myrkur"),
    "dagsetur": ("Dagsetur", "dagsetur"),
    "solarhaed": ("Sólarhæð", "solarhaed"),
}

# keyword -> position key; ordered so the most specific phrases win
_KEYWORDS = (
    ("sólarupprás", "solris"),
    ("sólris", "solris"),
    ("rís sólin", "solris"),
    ("reis sólin", "solris"),
    ("kemur sólin upp", "solris"),
    ("sólsetur", "solarlag"),
    ("sólarlag", "solarlag"),
    ("sest sólin", "solarlag"),
    ("settist sólin", "solarlag"),
    ("sólarhæð", "solarhaed"),
    ("dögun", "dogun"),
    ("birting", "birting"),
    ("myrkur", "myrkur"),
    ("dagsetur", "dagsetur"),
    ("hádegi", "hadegi"),
    ("miðnætti", "midnaetti"),
)

# a sun query must open like the reference grammar's QSunQuery
_OPENERS = ("hvenær", "klukkan hvað", "hver er", "hver verður",
            "hvað er", "hvað verður")

_DATE_WORDS = (
    ("á morgun", 1),
    ("í gær", -1),
    ("í dag", 0),
    ("í kvöld", 0),
    ("í morgun", 0),
    ("í nótt", 0),
)

_PLACE_RE = re.compile(
    r"\b(?:í|á)\s+([a-záðéíóúýþæö][\wáðéíóúýþæö]*)\s*$", re.I
)


def parse_sun_query(q: str,
                    today: datetime.date) -> Optional[dict]:
    """Return {position, date, when, place} for a sun query, else
    None.  *today* is the Router's injectable clock."""
    s = q.strip().rstrip("?").strip().lower()
    if not s.startswith(_OPENERS):
        return None
    pos = next((p for kw, p in _KEYWORDS if kw in s), None)
    if pos is None:
        return None

    delta, when = 0, "í dag"
    for phrase, d in _DATE_WORDS:
        if phrase in s:
            delta = d
            when = "á morgun" if d == 1 else ("í gær" if d == -1
                                             else "í dag")
            s = s.replace(phrase, " ")
            break

    m = _PLACE_RE.search(s.rstrip())
    place = m.group(1) if m else None
    # the position keyword itself can sit after í/á ("í myrkur" never
    # happens, but "sólin upp" leaves "upp"); drop non-place captures
    if place in {"upp", "sólin"}:
        place = None
    return {
        "position": pos,
        "date": today + datetime.timedelta(days=delta),
        "when": when,
        "place": place,
    }


def _fmt_hm(minutes: float) -> str:
    m = int(round(minutes)) % 1440
    return f"{m // 60}:{m % 60:02d}"


def format_sun_answer(position: str, when: str, qdate: datetime.date,
                      today: datetime.date,
                      minutes: "float | None",
                      degrees: "float | None" = None) -> str:
    """The reference's tensed answer strings (sunpos.py:397-489).

    *minutes* is the event time in minutes after 00:00 UTC (None when
    the almanac cell is empty — polar day/night); *degrees* the solar
    noon elevation for sólarhæð.  Tense: past for í gær, future for
    á morgun, present for í dag (the reference additionally compares
    wall-clock time-of-day for today; the Router's clock is date-
    valued, so today stays present/future tense)."""
    in_past = qdate < today

    if position == "solarhaed":
        deg = 0.0 if degrees is None else degrees
        txt = f"{deg:.1f}".replace(".", ",")
        if txt.endswith(",0"):
            txt = txt[:-2]
        unit = "gráða" if txt == "1" else "gráður"
        verb = "var" if in_past else ("er" if qdate == today
                                      else "verður")
        return f"Sólarhæð um hádegi {when} {verb} um {txt} {unit}."

    word = POSITION_WORDS[position][0]
    if minutes is None:
        verb = "varð" if in_past else "verður"
        return f"Það {verb} ekki {word.lower()} {when}."

    hour = (int(round(minutes)) % 1440) // 60
    # today-refinement (sunpos.py:444-452)
    if when == "í dag":
        if hour >= 23 or hour <= 4:
            when = "í nótt"
        elif 4 < hour <= 9:
            when = "í morgun"
        elif 20 <= hour < 23:
            when = "í kvöld"
    elif when == "á morgun" and hour <= 4:
        when = "í nótt"

    t = _fmt_hm(minutes)
    if position == "solris":
        return (f"Sólin reis um klukkan {t} {when}." if in_past
                else f"Sólin rís um klukkan {t} {when}.")
    if position == "solarlag":
        return (f"Sólin settist um klukkan {t} {when}." if in_past
                else f"Sólin sest um klukkan {t} {when}.")
    verb = "var" if in_past else "verður"
    return f"{word} {verb} um klukkan {t} {when}."
