"""Time-of-day qtype — the reference's `queries/time.py`.

"hvað er klukkan [í X]?" answers HH:MM (time.py:228-244): bare
queries in Iceland's timezone (UTC year-round), located queries by a
pytz lookup over the place.  Here the wall clock is injectable (the
same determinism seam as the date qtype's clock) and the timezone
database is an injectable (city, utc_offset_min) dimension — the
reference's `timezone4loc`/`country_timezones` chain collapsed to the
offset the answer actually needs.
"""

from __future__ import annotations

import re
from typing import Optional

__all__ = ["parse_clock_query", "format_clock_answer"]

_CLOCK_RE = re.compile(
    r"^(?:hvað er klukkan|hvað líður tímanum)"
    r"(?:\s+(?:í|á|hjá)\s+(.+?))?\s*$",
    re.I,
)


def parse_clock_query(q: str) -> Optional[dict]:
    """Return {loc} for a clock question ({loc: None} for the bare
    form), else None."""
    s = q.strip().rstrip("?").strip()
    if m := _CLOCK_RE.match(s):
        return {"loc": m.group(1)}
    return None


def format_clock_answer(minute_of_day: int,
                        loc: "str | None" = None) -> tuple:
    """(answer, voice) — the reference's "%02d:%02d" display answer
    and located voice string (time.py:215-241)."""
    m = minute_of_day % 1440
    answer = f"{m // 60:02d}:{m % 60:02d}"
    voice = (f"Klukkan í {loc} er {answer}." if loc
             else f"Klukkan er {answer}.")
    return answer, voice
