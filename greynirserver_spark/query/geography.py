"""Geography qtype — the reference's `queries/geography.py`,
answered from injectable dimensions instead of its bundled country
resources.

The reference resolves country names through `country_isocodes` /
`capital_for_cc` / `continent_for_country` lookups over static JSON
resources and BÍN case folding; here the same four question shapes —

* "hver er höfuðborg X?"        → capital      (geography.py:129-155)
* "í hvaða landi er X?"         → country-of   (geography.py:158-183)
* "í hvaða heimsálfu er X?"     → continent-of (geography.py:186-228)
* "hvar er X?"                  → loc-desc     (geography.py:230-257)

— answer from a `countries` dimension (cc, country, country_gen,
country_loc, capital, continent, continent_dat) plus the Router's
existing places dim (place → cc) for placename subjects.  The dims are
tiny (10² countries, 10⁴ places) next to any corpus, so resolution is
a bounded broadcast-style lookup; at serving time the Router collects
the one matching row, exactly like the distance qtype.

`country_loc` carries the reference's preposition form ("í
Þýskalandi", country_desc), `continent_dat` the dative continent
("Evrópu", nom2dat) — the declension knowledge the reference pulls
from BÍN lives in the dimension, where a production deployment would
materialize it once.
"""

from __future__ import annotations

import re
from typing import Optional

__all__ = ["parse_geo_query", "GEO_OPS"]

GEO_OPS = ("capital", "country_of", "continent_of", "where_is")

_CAPITAL_RE = re.compile(
    r"^(?:hver|hvað) er höfuðborg(?:in í)?\s+(.+?)\s*$", re.I
)
_COUNTRY_RE = re.compile(r"^í hvaða landi er\s+(.+?)\s*$", re.I)
_CONTINENT_RE = re.compile(
    r"^í hvaða heimsálfu (?:er|eru)\s+(.+?)\s*$", re.I
)
_WHERE_RE = re.compile(r"^hvar er(?:u)?\s+(?:landið\s+)?(.+?)\s*$", re.I)


def parse_geo_query(q: str) -> Optional[dict]:
    """Return {op, subject} for a geography question, else None.
    The subject keeps its surface case (genitive for capitals, the
    way the grammar hands it over — geography.py:114-126)."""
    s = q.strip().rstrip("?").strip()
    if m := _CAPITAL_RE.match(s):
        return {"op": "capital", "subject": m.group(1)}
    if m := _COUNTRY_RE.match(s):
        return {"op": "country_of", "subject": m.group(1)}
    if m := _CONTINENT_RE.match(s):
        return {"op": "continent_of", "subject": m.group(1)}
    if m := _WHERE_RE.match(s):
        return {"op": "where_is", "subject": m.group(1)}
    return None


def cap_first(s: str) -> str:
    """The reference's cap_first (queries/util)."""
    return s[:1].upper() + s[1:] if s else s
