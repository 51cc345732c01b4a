"""Unit-conversion query answering — the reference's ``queries/unit.py``
qtype, driver-side.

Conversion factors are the REFERENCE'S OWN (including its documented
roundings: pund = 0.454 kg, míla = 1609 m, bolli = 2.5e-4 m³ … —
``_UNITS``, unit.py:96-178), because matching its answers is the
point; the parser itself is the same from-scratch regex dispatch as
`query/arithmetic.py` (the reference parses through its grammar +
BÍN declension lookup, which is out of scope — surface forms are a
small explicit variants table instead).

Supported shapes:
* "hvað eru/er X <unit> í <unit-þgf>?"   (5 kíló í pundum)
* "hversu margir/margar/mörg <unit> eru í X <unit>?"
Cross-dimension requests answer the reference's refusal.
"""

from __future__ import annotations

import re

from .arithmetic import _parse_num, iceformat_number

__all__ = ["parse_unit_query", "UNITS"]

# canonical unit -> (dimension, factor to the dimension's SI base)
# factors: reference unit.py:96-178
UNITS = {
    # weight (kg)
    "kíló": ("kg", 1.0), "kílógramm": ("kg", 1.0), "gramm": ("kg", 1e-3),
    "tonn": ("kg", 1e3), "pund": ("kg", 454.0e-3), "únsa": ("kg", 28.35e-3),
    "karat": ("kg", 0.2e-3), "steinn": ("kg", 6.35),
    # distance (m)
    "metri": ("m", 1.0), "kílómetri": ("m", 1e3), "desímetri": ("m", 0.1),
    "sentímetri": ("m", 1e-2), "millimetri": ("m", 1e-3),
    "míla": ("m", 1609.0), "sjómíla": ("m", 1852.0), "fet": ("m", 0.305),
    "tomma": ("m", 2.54e-2), "ljósár": ("m", 9460730472580.8e3),
    # volume (m³)
    "lítri": ("m³", 1e-3), "millilítri": ("m³", 1e-6),
    "desílítri": ("m³", 1e-4), "rúmmetri": ("m³", 1.0),
    "gallon": ("m³", 3.8e-3), "bolli": ("m³", 2.5e-4),
    "matskeið": ("m³", 15e-6), "teskeið": ("m³", 5e-6),
    # area (m²)
    "fermetri": ("m²", 1.0), "ferkílómetri": ("m²", 1e6),
    "hektari": ("m²", 1e4), "ekra": ("m²", 4047.0),
    "fersentímetri": ("m²", 1e-4),
    # time (s)
    "sekúnda": ("s", 1.0), "mínúta": ("s", 60.0),
    "klukkustund": ("s", 3600.0), "klukkutími": ("s", 3600.0),
    "dagur": ("s", 86400.0), "vika": ("s", 604800.0),
    "ár": ("s", 3600.0 * 24 * 365.25),
    "öld": ("s", 3600.0 * 24 * 365.25 * 100),
}

# surface form -> canonical (nominative/plural/dative variants; the
# reference resolves these through BÍN — unit.py:230-234 maps spelling
# variants the same way)
_VARIANTS = {
    "kíló": "kíló", "kílói": "kíló", "kílóum": "kíló",
    "kílógramm": "kílógramm", "kílógrömm": "kílógramm",
    "kílógrömmum": "kílógramm",
    "gramm": "gramm", "grömm": "gramm", "grömmum": "gramm",
    "grammi": "gramm",
    "tonn": "tonn", "tonni": "tonn", "tonnum": "tonn",
    "pund": "pund", "pundi": "pund", "pundum": "pund",
    "únsa": "únsa", "únsur": "únsa", "únsum": "únsa",
    "karat": "karat", "karöt": "karat", "karötum": "karat",
    "steinn": "steinn", "steinar": "steinn", "steinum": "steinn",
    "metri": "metri", "metrar": "metri", "metra": "metri",
    "metrum": "metri",
    "kílómetri": "kílómetri", "kílómetrar": "kílómetri",
    "kílómetra": "kílómetri", "kílómetrum": "kílómetri",
    "desímetri": "desímetri", "desímetrar": "desímetri",
    "desímetrum": "desímetri", "desimetri": "desímetri",
    "sentímetri": "sentímetri", "sentímetrar": "sentímetri",
    "sentímetra": "sentímetri", "sentímetrum": "sentímetri",
    "sentimetri": "sentímetri", "sentimetrum": "sentímetri",
    "millimetri": "millimetri", "millimetrar": "millimetri",
    "millimetrum": "millimetri",
    "míla": "míla", "mílur": "míla", "mílu": "míla", "mílum": "míla",
    "sjómíla": "sjómíla", "sjómílur": "sjómíla", "sjómílum": "sjómíla",
    "fet": "fet", "feti": "fet", "fetum": "fet",
    "tomma": "tomma", "tommur": "tomma", "tommum": "tomma",
    "ljósár": "ljósár", "ljósári": "ljósár", "ljósárum": "ljósár",
    "lítri": "lítri", "lítrar": "lítri", "lítra": "lítri",
    "lítrum": "lítri",
    "millilítri": "millilítri", "millilítrar": "millilítri",
    "millilítrum": "millilítri",
    "desílítri": "desílítri", "desílítrar": "desílítri",
    "desílítrum": "desílítri",
    "rúmmetri": "rúmmetri", "rúmmetrar": "rúmmetri",
    "rúmmetrum": "rúmmetri",
    "gallon": "gallon", "gallón": "gallon", "gallonum": "gallon",
    "bolli": "bolli", "bollar": "bolli", "bollum": "bolli",
    "bolla": "bolli",
    "matskeið": "matskeið", "matskeiðar": "matskeið",
    "matskeiðum": "matskeið",
    "teskeið": "teskeið", "teskeiðar": "teskeið",
    "teskeiðum": "teskeið",
    "fermetri": "fermetri", "fermetrar": "fermetri",
    "fermetrum": "fermetri", "fermetra": "fermetri",
    "ferkílómetri": "ferkílómetri", "ferkílómetrar": "ferkílómetri",
    "ferkílómetrum": "ferkílómetri",
    "fersentímetri": "fersentímetri", "fersentímetrar": "fersentímetri",
    "fersentímetrum": "fersentímetri",
    "hektari": "hektari", "hektarar": "hektari", "hektörum": "hektari",
    "hektara": "hektari",
    "ekra": "ekra", "ekrur": "ekra", "ekrum": "ekra",
    "sekúnda": "sekúnda", "sekúndur": "sekúnda", "sekúndum": "sekúnda",
    "mínúta": "mínúta", "mínútur": "mínúta", "mínútum": "mínúta",
    "klukkustund": "klukkustund", "klukkustundir": "klukkustund",
    "klukkustundum": "klukkustund",
    "klukkutími": "klukkutími", "klukkutímar": "klukkutími",
    "klukkutímum": "klukkutími", "klukkutíma": "klukkutími",
    "dagur": "dagur", "dagar": "dagur", "dögum": "dagur",
    "vika": "vika", "vikur": "vika", "vikum": "vika",
    "ár": "ár", "ári": "ár", "árum": "ár",
    "öld": "öld", "aldir": "öld", "öldum": "öld",
}

_UNIT_ALT = "|".join(sorted(_VARIANTS, key=len, reverse=True))
_NUMQ = r"(\d+(?:,\d+)?|[a-zþæöðáéíóúý]+(?:\s+og\s+[a-zþæöðáéíóúý]+)?)"

_CONV_RE = re.compile(
    r"^hvað\s+(?:er|eru)\s+" + _NUMQ
    + rf"\s+({_UNIT_ALT})\s+í\s+({_UNIT_ALT})\??$", re.I)
_HOWMANY_RE = re.compile(
    r"^(?:hversu|hvað)\s+(?:margir|margar|mörg)\s+"
    rf"({_UNIT_ALT})\s+(?:er|eru)\s+í\s+" + _NUMQ
    + rf"\s+({_UNIT_ALT})\??$", re.I)

_MISMATCH = "Því miður get ég ekki umbreytt á milli þessara eininga."

# nominative plural display forms (answers read "2 lítrar", "1 lítri")
_PLURAL = {
    "kíló": "kíló", "kílógramm": "kílógrömm", "gramm": "grömm",
    "tonn": "tonn", "pund": "pund", "únsa": "únsur", "karat": "karöt",
    "steinn": "steinar", "metri": "metrar", "kílómetri": "kílómetrar",
    "desímetri": "desímetrar", "sentímetri": "sentímetrar",
    "millimetri": "millimetrar", "míla": "mílur", "sjómíla": "sjómílur",
    "fet": "fet", "tomma": "tommur", "ljósár": "ljósár",
    "lítri": "lítrar", "millilítri": "millilítrar",
    "desílítri": "desílítrar", "rúmmetri": "rúmmetrar",
    "gallon": "gallon", "bolli": "bollar", "matskeið": "matskeiðar",
    "teskeið": "teskeiðar", "fermetri": "fermetrar",
    "ferkílómetri": "ferkílómetrar", "fersentímetri": "fersentímetrar",
    "hektari": "hektarar", "ekra": "ekrur", "sekúnda": "sekúndur",
    "mínúta": "mínútur", "klukkustund": "klukkustundir",
    "klukkutími": "klukkutímar", "dagur": "dagar", "vika": "vikur",
    "ár": "ár", "öld": "aldir",
}


def _unit_word(unit: str, v: float) -> str:
    return unit if abs(v) == 1 else _PLURAL[unit]


def _fmt(v: float) -> str:
    if v == int(v) and abs(v) < 1e15:
        return iceformat_number(v)
    return f"{v:.6g}".replace("e+", "·10^").replace("e-", "·10^-") \
        .replace(".", ",")


def _convert(x: float, src: str, dst: str) -> "dict":
    dim_s, f_s = UNITS[src]
    dim_d, f_d = UNITS[dst]
    if dim_s != dim_d:
        return dict(op="unit_convert", expr=f"{src}->{dst}", value=None,
                    answer=_MISMATCH)
    v = x * f_s / f_d
    verb = "er" if abs(x) == 1 else "eru"
    return dict(op="unit_convert",
                expr=f"{x} {src} -> {dst}", value=v,
                answer=f"{_fmt(x)} {_unit_word(src, x)} {verb} "
                       f"{_fmt(v)} {_unit_word(dst, round(v, 9))}.")


def parse_unit_query(qtext: str) -> "dict | None":
    q = qtext.strip().rstrip("?").strip()
    try:
        if m := _CONV_RE.match(q + "?"):
            x = _parse_num(m.group(1))
            src = _VARIANTS[m.group(2).lower()]
            dst = _VARIANTS[m.group(3).lower()]
            return _convert(x, src, dst)
        if m := _HOWMANY_RE.match(q + "?"):
            dst = _VARIANTS[m.group(1).lower()]
            x = _parse_num(m.group(2))
            src = _VARIANTS[m.group(3).lower()]
            return _convert(x, src, dst)
    except (ValueError, KeyError):
        return None
    return None
