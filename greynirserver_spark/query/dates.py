"""Date/calendar query answering — the reference's ``queries/date.py``
qtype, driver-side, with an injectable clock.

The reference parses date questions through its grammar and answers
from the Flask worker's wall clock (date.py:120-123); here the clock
is a parameter so every answer is deterministic and testable.  Covered
semantics mirror the reference:

* "hvaða dagur er í dag / á morgun", "hvaða dagur var í gær" —
  full Icelandic date (weekday + day. month year)
* "hvaða ár er (núna)" — the current year (date.py:190-192)
* "er (árið) YYYY hlaupár" — Gregorian leap-year rule
  (date.py:194-196)
* "hvenær eru páskar (árið YYYY)" — Butcher's algorithm for Western
  Easter (public-domain computus, the same algorithm the reference
  uses at date.py:459-473); movable feasts are Easter offsets exactly
  as in the reference: hvítasunna +49 (date.py:236-238),
  uppstigningardagur +39 (:241-243), öskudagur −46 (:246-248),
  bolludagur −48 (:251-253)
* fixed-date holidays via "next occurrence" (dnext) like the
  reference's table (:256-300): jóladagur 25.12, aðfangadagur 24.12,
  þorláksmessa 23.12, gamlársdagur 31.12, nýársdagur 1.1,
  hrekkjavaka 31.10, fullveldisdagurinn 1.12, þjóðhátíðardagurinn 17.6,
  sumardagurinn fyrsti = first Thursday after 18.4
* "hvað er langt til X" / "hvað eru margir dagar til X" — day count
  to the target's next occurrence; also absolute targets
  "... til 17. júní"

The grammar/voice layer is out of scope (no TTS); this is the same
regex-dispatch pattern as `query/arithmetic.py`.
"""

from __future__ import annotations

import re
from datetime import date, timedelta

__all__ = ["parse_date_query", "calc_easter", "icedate"]

WEEKDAYS = ("mánudagur", "þriðjudagur", "miðvikudagur", "fimmtudagur",
            "föstudagur", "laugardagur", "sunnudagur")
MONTHS = ("janúar", "febrúar", "mars", "apríl", "maí", "júní", "júlí",
          "ágúst", "september", "október", "nóvember", "desember")


def calc_easter(year: int) -> date:
    """Western Easter via Butcher's algorithm (public-domain computus;
    the reference uses the identical published formula,
    date.py:459-473)."""
    a = year % 19
    b, c = year // 100, year % 100
    d = (19 * a + b - b // 4 - ((b - (b + 8) // 25 + 1) // 3) + 15) % 30
    e = (32 + 2 * (b % 4) + 2 * (c // 4) - d - (c % 4)) % 7
    f = d + e - 7 * ((a + 11 * d + 22 * e) // 451) + 114
    return date(year, f // 31, f % 31 + 1)


def _dnext(now: date, month: int, day: int) -> date:
    """Next occurrence of (month, day) on or after *now* — the
    reference's dnext (date.py:125-131)."""
    d = date(now.year, month, day)
    return d if d >= now else date(now.year + 1, month, day)


def _first_summer_day(now: date) -> date:
    """First Thursday after April 18 (sumardagurinn fyrsti), next
    occurrence."""
    for year in (now.year, now.year + 1):
        d = date(year, 4, 19)
        d += timedelta(days=(3 - d.weekday()) % 7)
        if d >= now:
            return d
    raise AssertionError("unreachable")


def _next_easter(now: date) -> date:
    e = calc_easter(now.year)
    return e if e >= now else calc_easter(now.year + 1)


def icedate(d: date) -> str:
    """'fimmtudagur 17. júní 2027' — Icelandic long date."""
    return f"{WEEKDAYS[d.weekday()]} {d.day}. {MONTHS[d.month - 1]} {d.year}"


# holiday name (lemma-ish match) -> resolver(now) -> date
_FIXED = {
    "jóladagur": (12, 25), "jól": (12, 25), "jóla": (12, 25),
    "aðfangadagur": (12, 24), "þorláksmessa": (12, 23),
    "þorláksmessu": (12, 23), "gamlársdagur": (12, 31),
    "gamlársdags": (12, 31), "nýársdagur": (1, 1), "nýársdags": (1, 1),
    "hrekkjavaka": (10, 31), "hrekkjavöku": (10, 31),
    "fullveldisdagurinn": (12, 1), "fullveldisdagsins": (12, 1),
    "þjóðhátíðardagurinn": (6, 17), "þjóðhátíðardagsins": (6, 17),
}
_EASTER_OFFSETS = {
    "páskar": 0, "páska": 0, "páskadagur": 0,
    "hvítasunna": 49, "hvítasunnu": 49,
    "uppstigningardagur": 39, "uppstigningardags": 39,
    "öskudagur": -46, "öskudags": -46,
    "bolludagur": -48, "bolludags": -48,
}
_SUMMER = ("sumardagurinn fyrsti", "sumardagsins fyrsta",
           "sumardaginn fyrsta")

_MONTH_GEN = {  # genitive month names for "til 17. júní"
    "janúar": 1, "febrúar": 2, "mars": 3, "apríl": 4, "maí": 5,
    "júní": 6, "júlí": 7, "ágúst": 8, "september": 9, "október": 10,
    "nóvember": 11, "desember": 12,
}

_TODAY_RE = re.compile(
    r"^hvaða dagur (?:er í dag|er á morgun|var í gær)\??$", re.I)
_YEAR_RE = re.compile(r"^hvaða ár er(?: núna)?\??$", re.I)
_LEAP_RE = re.compile(r"^er (?:árið )?(\d{4}) hlaupár\??$", re.I)
_WHEN_RE = re.compile(
    r"^hvenær (?:er|eru|verður|verða)\s+(.+?)(?:\s+árið\s+(\d{4}))?\??$",
    re.I)
_UNTIL_RE = re.compile(
    r"^(?:hvað er langt (?:til|í)|hvað eru margir dagar (?:til|í)|"
    r"hversu margir dagar eru (?:til|í))\s+(.+?)\??$", re.I)
_ABS_DATE_RE = re.compile(r"^(\d{1,2})\.?\s+([a-zþæöðáéíóúý]+)$", re.I)


def _resolve_target(name: str, now: date, year: "int | None" = None):
    n = name.strip().lower().rstrip("?").strip()
    n = re.sub(r"^(?:næstu|næsta|næsti)\s+", "", n)
    if n in _SUMMER:
        return _first_summer_day(now), "sumardagurinn fyrsti"
    if n in _EASTER_OFFSETS:
        base = calc_easter(year) if year else None
        if base is None:
            # offset feasts move with THEIR next occurrence
            for y in (now.year, now.year + 1):
                d = calc_easter(y) + timedelta(days=_EASTER_OFFSETS[n])
                if d >= now:
                    return d, n
        else:
            return base + timedelta(days=_EASTER_OFFSETS[n]), n
    if n in _FIXED:
        m, dd = _FIXED[n]
        if year:
            return date(year, m, dd), n
        return _dnext(now, m, dd), n
    if m := _ABS_DATE_RE.match(n):
        day, mon = int(m.group(1)), m.group(2).lower()
        if mon in _MONTH_GEN and 1 <= day <= 31:
            try:
                return _dnext(now, _MONTH_GEN[mon], day), n
            except ValueError:
                return None
    return None


def parse_date_query(qtext: str, now: date) -> "dict | None":
    """Parse *qtext* against the date patterns; return
    ``{op, target, value, answer}`` or None to fall through."""
    q = qtext.strip().rstrip("?").strip()
    if _TODAY_RE.match(q + "?"):
        if "morgun" in q.lower():
            d, prefix = now + timedelta(days=1), "Á morgun er"
        elif "gær" in q.lower():
            d, prefix = now - timedelta(days=1), "Í gær var"
        else:
            d, prefix = now, "Í dag er"
        return dict(op="current_date", target=d.isoformat(),
                    value=float(d.toordinal()),
                    answer=f"{prefix} {icedate(d)}.")
    if _YEAR_RE.match(q + "?"):
        return dict(op="which_year", target=None, value=float(now.year),
                    answer=f"Það er árið {now.year}.")
    if m := _LEAP_RE.match(q + "?"):
        y = int(m.group(1))
        leap = y % 4 == 0 and (y % 100 != 0 or y % 400 == 0)
        word = "er" if leap else "er ekki"
        return dict(op="leap_year", target=None, value=float(leap),
                    answer=f"Árið {y} {word} hlaupár.")
    if m := _WHEN_RE.match(q + "?"):
        year = int(m.group(2)) if m.group(2) else None
        hit = _resolve_target(m.group(1), now, year)
        if hit is None:
            return None
        d, desc = hit
        return dict(op="when_is", target=d.isoformat(),
                    value=float(d.toordinal()),
                    answer=f"{icedate(d).capitalize()}.")
    if m := _UNTIL_RE.match(q + "?"):
        hit = _resolve_target(m.group(1), now)
        if hit is None:
            return None
        d, desc = hit
        days = (d - now).days
        if days == 0:
            answer = f"Það er {desc} í dag."
        else:
            unit = "dagur" if days == 1 else "dagar"
            answer = f"{days} {unit}."
        return dict(op="days_until", target=d.isoformat(),
                    value=float(days), answer=answer)
    return None
