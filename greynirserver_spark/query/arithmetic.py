"""Arithmetic query answering — the reference's ``queries/arithmetic.py``
qtype, driver-side.

The reference parses spoken Icelandic arithmetic through its grammar
and evaluates on the Flask worker (arithmetic.py:442-582); query
strings are tiny, so this is plain Python by design, exactly like
`query_to_terms`.  Covered operations and their semantics mirror the
reference:

* ``X plús/mínus/sinnum/deilt með Y`` and symbol forms ``+ - * /``
  (``_STD_OPERATORS``, arithmetic.py:449-455); division by zero
  answers "Það er ekki hægt að deila með núlli." (arithmetic.py:557-559)
* ``kvaðratrótin af X`` → ``round(sqrt(x), 2)`` (arithmetic.py:504-509)
* ``X í N veldi`` → ``x ** n``, exponent capped at 50
  (arithmetic.py:512-516)
* ``X prósent af Y`` → ``(x * y) / 100`` (arithmetic.py:526-529)
* ``X með/án virðisaukaskatti`` → ``x * 1.24`` / ``x / 1.24``
  (``_VAT_MULT``, arithmetic.py:470, 541-551)
* pi: "hvað er pí" (arithmetic.py:585-591)

Numbers are digits (Icelandic decimal comma accepted) or the core
number words; answers format floats the Icelandic way (decimal comma,
integral results without a trailing ",0"), like ``iceformat_float``.
This is a from-scratch regex implementation — the reference's grammar
nonterminals and GSSML voice layer are out of scope (SURVEY §2:
no TTS).
"""

from __future__ import annotations

import math
import re

__all__ = ["parse_arithmetic", "iceformat_number"]

_VAT_MULT = 1.24  # reference arithmetic.py:470

_NUMBER_WORDS = {
    "núll": 0, "einn": 1, "ein": 1, "eitt": 1, "einum": 1,
    "einni": 1, "einu": 1,
    "tveir": 2, "tvær": 2, "tvö": 2, "tveimur": 2, "tveim": 2,
    "þrír": 3, "þrjár": 3, "þrjú": 3, "þremur": 3, "þrem": 3,
    "fjórir": 4, "fjórar": 4, "fjögur": 4, "fjórum": 4,
    "fimm": 5, "sex": 6, "sjö": 7, "átta": 8,
    "níu": 9, "tíu": 10, "ellefu": 11, "tólf": 12, "þrettán": 13,
    "fjórtán": 14, "fimmtán": 15, "sextán": 16, "sautján": 17,
    "átján": 18, "nítján": 19, "tuttugu": 20, "þrjátíu": 30,
    "fjörutíu": 40, "fimmtíu": 50, "sextíu": 60, "sjötíu": 70,
    "áttatíu": 80, "níutíu": 90, "hundrað": 100, "þúsund": 1000,
    "milljón": 1_000_000,
}

_WORDS_ALT = "|".join(sorted(
    list(_NUMBER_WORDS) + ["hundruð", "þúsundir", "milljónir"],
    key=len, reverse=True,
))
# a number: digits (optional Icelandic decimal comma) or a number-word
# chain like "tuttugu og fimm" / "þrjú hundruð"
_NUM = (
    r"(?:mínus\s+)?(?:\d+(?:,\d+)?|(?:(?:" + _WORDS_ALT
    + r")(?:\s+og)?\s*)+)"
)

_PREFIX = r"^(?:hvað|hver)\s+(?:er|eru)\s+"
_STD_RE = re.compile(
    _PREFIX + rf"({_NUM})\s*(plús|mínus|sinnum|deilt með|\+|-|\*|/)\s*"
    rf"({_NUM})\??$", re.I)
_SQRT_RE = re.compile(
    _PREFIX + rf"(?:kvaðratrótin|ferningsrótin)\s+af\s+({_NUM})\??$", re.I)
_POW_RE = re.compile(
    _PREFIX + rf"({_NUM})\s+í\s+({_NUM})\.?\s*veldi\??$", re.I)
_PERCENT_RE = re.compile(
    _PREFIX + rf"({_NUM})\s+prósenta?\s+af\s+({_NUM})\??$", re.I)
_VAT_RE = re.compile(
    _PREFIX + rf"({_NUM})\s+(með|án)\s+(?:vsk|virðisaukaskatti)\??$", re.I)
_PI_RE = re.compile(_PREFIX + r"(?:pí|π)\??$", re.I)

_OPS = {
    "plús": "+", "+": "+", "mínus": "-", "-": "-",
    "sinnum": "*", "*": "*", "deilt með": "/", "/": "/",
}


def _parse_num(s: str) -> float:
    s = s.strip().lower()
    neg = False
    if s.startswith("mínus "):
        neg, s = True, s[len("mínus "):].strip()
    if re.fullmatch(r"\d+(?:,\d+)?", s):
        v = float(s.replace(",", "."))
        return -v if neg else v
    # word chain: additive, except tens/hundreds/thousands multiply a
    # preceding small count ("þrjú hundruð" -> 300)
    total, pending = 0.0, 0.0
    for w in re.split(r"\s+", s):
        if w == "og" or not w:
            continue
        w_base = {"hundruð": "hundrað", "þúsundir": "þúsund",
                  "milljónir": "milljón"}.get(w, w)
        if w_base not in _NUMBER_WORDS:
            raise ValueError(w)
        v = _NUMBER_WORDS[w_base]
        if v >= 100 and pending:
            total += pending * v
            pending = 0.0
        elif v >= 100:
            total += v
        else:
            pending += v
    total += pending
    return -total if neg else total


def iceformat_number(x: float) -> str:
    """Icelandic float format: decimal comma, no trailing ',0'."""
    if x == int(x) and abs(x) < 1e15:
        return str(int(x))
    return f"{x:.10g}".replace(".", ",")


def parse_arithmetic(qtext: str) -> "dict | None":
    """Parse *qtext*; return ``{op, expr, value, answer}`` or None if
    the text is not an arithmetic question (the caller falls through
    to the next qtype).  A well-formed question with an undefined
    result (division by zero, over-cap exponent) returns ``value
    None`` and the reference's refusal text."""
    q = qtext.strip().rstrip("?").strip()
    try:
        if _PI_RE.match(qtext.strip()):
            v = 3.14159265359  # the reference's spoken constant
            return dict(op="pi", expr="pi", value=v,
                        answer=iceformat_number(v))
        if m := _SQRT_RE.match(q + "?"):
            a = _parse_num(m.group(1))
            if a < 0:
                return dict(op="sqrt", expr=f"sqrt({a})", value=None,
                            answer="Kvaðratrót af neikvæðri tölu er "
                                   "ekki skilgreind.")
            v = round(math.sqrt(a), 2)
            return dict(op="sqrt", expr=f"sqrt({a})", value=v,
                        answer=iceformat_number(v))
        if m := _POW_RE.match(q + "?"):
            a, b = _parse_num(m.group(1)), _parse_num(m.group(2))
            if b > 50:  # reference cap, arithmetic.py:514
                return dict(op="pow", expr=f"pow({a}, {b})", value=None,
                            answer="Þetta er of hátt veldi.")
            v = float(a ** b)
            return dict(op="pow", expr=f"pow({a}, {b})", value=v,
                        answer=iceformat_number(v))
        if m := _PERCENT_RE.match(q + "?"):
            a, b = _parse_num(m.group(1)), _parse_num(m.group(2))
            v = (a * b) / 100.0
            return dict(op="percent", expr=f"({a} * {b}) / 100.0",
                        value=v, answer=iceformat_number(v))
        if m := _VAT_RE.match(q + "?"):
            a = _parse_num(m.group(1))
            with_vat = m.group(2).lower() == "með"
            v = a * _VAT_MULT if with_vat else a / _VAT_MULT
            op = "with_vat" if with_vat else "without_vat"
            sym = "*" if with_vat else "/"
            return dict(op=op, expr=f"{a} {sym} {_VAT_MULT}", value=v,
                        answer=iceformat_number(v))
        if m := _STD_RE.match(q + "?"):
            a, b = _parse_num(m.group(1)), _parse_num(m.group(3))
            sym = _OPS[m.group(2).lower()]
            if sym == "/" and b == 0:
                return dict(op="divide", expr=f"{a} / {b}", value=None,
                            answer="Það er ekki hægt að deila með "
                                   "núlli.")
            v = {"+": a + b, "-": a - b, "*": a * b,
                 "/": a / b if b else None}[sym]
            op = {"+": "plus", "-": "minus", "*": "multiply",
                  "/": "divide"}[sym]
            return dict(op=op, expr=f"{a} {sym} {b}", value=v,
                        answer=iceformat_number(v))
    except ValueError:
        return None
    return None
