"""Currency qtype — the reference's `queries/currency.py`, computed
from an injectable exchange-rates dimension.

The reference fetches live rates from two bank APIs
(currency.py:210-240, Arion/Landsbankinn) into a dict of
ISO-code → ISK value with ``xr["ISK"] = 1.0``, then answers four
operation shapes (currency.py:275-345):

* general   — "hvert er gengi dollarans?"            → rate → ISK
* exchange  — "hvert er gengi evru gagnvart dollara?" → xr[a]/xr[b]
* convert   — "hvað eru 100 evrur margar krónur?"     → amount×rate
* index     — "hver er gengisvísitalan?"              → xr["GVT"]

Here the rates are an injectable (cc, rate_isk) dimension — an
external fetch cannot be the engine of record — and the cross-rate
arithmetic is the reference's exactly: a currency is always worth 1
of itself, foreign/foreign goes through the ISK base
(currency.py:243-265).  The Icelandic currency-word → ISO fold
(evrur→EUR, dollarans→USD, "danskar krónur"→DKK …) replaces the
grammar's noun phrases; number formatting is the reference's
iceformat_float (thousands '.', decimal ',').
"""

from __future__ import annotations

import re
from typing import Optional

__all__ = [
    "parse_currency_query",
    "compute_currency",
    "iceformat_float",
    "is_plural_isk",
]

# adjective-qualified krónur first (the reference's QCurUnit noun
# phrases), then single-word folds; every surface form the grammar's
# case variants produce for the supported set
_COMPOUND = (
    (re.compile(r"\bdanskr?a?r?\s+krón\w+", re.I), "DKK"),
    (re.compile(r"\bnorskr?a?r?\s+krón\w+", re.I), "NOK"),
    (re.compile(r"\bsænskr?a?r?\s+krón\w+", re.I), "SEK"),
    (re.compile(r"\bsvissneskr?a?r?\s+frank\w+", re.I), "CHF"),
    (re.compile(r"\bbandarí(?:skra|skur|skum|sks)?\s*dal\w*", re.I),
     "USD"),
)

_WORDS = {
    "evra": "EUR", "evru": "EUR", "evrur": "EUR", "evrum": "EUR",
    "evrunnar": "EUR", "evrunni": "EUR", "evran": "EUR",
    "dollari": "USD", "dollara": "USD", "dollarans": "USD",
    "dollarar": "USD", "dollurum": "USD", "dollar": "USD",
    "bandaríkjadalur": "USD", "bandaríkjadals": "USD",
    "bandaríkjadal": "USD", "bandaríkjadalir": "USD",
    "pund": "GBP", "punds": "GBP", "pundi": "GBP", "pundið": "GBP",
    "pundsins": "GBP", "sterlingspund": "GBP", "sterlingspunds": "GBP",
    "jen": "JPY", "jens": "JPY", "jeni": "JPY",
    "króna": "ISK", "krónu": "ISK", "krónur": "ISK", "krónum": "ISK",
    "krónunnar": "ISK", "krónan": "ISK",
    "rúbla": "RUB", "rúblu": "RUB", "rúblur": "RUB",
    "júan": "CNY", "júans": "CNY",
    "gengisvísitala": "GVT", "gengisvísitalan": "GVT",
    "gengisvísitölu": "GVT",
}

_GENERAL_RE = re.compile(
    r"^(?:hvert|hvað|hvernig) er gengi(?:ð á)?\s+(.+?)\s*$", re.I
)
_EXCHANGE_SPLIT = re.compile(r"\s+gagnvart\s+", re.I)
_CONVERT_RE = re.compile(
    r"^hvað (?:eru|er)\s+(\d+(?:[.,]\d+)?)\s+(.+?)\s+"
    r"(?:margar|margir|mörg|mikið í)\s+(.+?)\s*$",
    re.I,
)
_INDEX_RE = re.compile(r"^(?:hver|hvað) er gengisvísitalan\s*$", re.I)


def _code_for(phrase: str) -> Optional[str]:
    p = phrase.strip().lower()
    for rx, code in _COMPOUND:
        if rx.search(p):
            return code
    # last token carries the currency noun ("gengi evru", "evrur")
    for tok in reversed(p.split()):
        if tok in _WORDS:
            return _WORDS[tok]
    return None


def parse_currency_query(q: str) -> Optional[dict]:
    """Return {op, c1, c2, amount} for a currency question, else
    None (op ∈ general|exchange|convert|index, the reference's
    result.op values, currency.py:146-207)."""
    s = q.strip().rstrip("?").strip()
    if _INDEX_RE.match(s):
        return {"op": "index", "c1": "GVT", "c2": "", "amount": None}
    if m := _CONVERT_RE.match(s):
        c1, c2 = _code_for(m.group(2)), _code_for(m.group(3))
        if c1 and c2:
            amt = float(m.group(1).replace(",", "."))
            return {"op": "convert", "c1": c1, "c2": c2,
                    "amount": amt}
        return None
    if m := _GENERAL_RE.match(s):
        parts = _EXCHANGE_SPLIT.split(m.group(1), maxsplit=1)
        c1 = _code_for(parts[0])
        if c1 is None:
            return None
        if len(parts) == 2:
            c2 = _code_for(parts[1])
            if c2 is None:
                return None
            return {"op": "exchange", "c1": c1, "c2": c2,
                    "amount": None}
        return {"op": "general", "c1": c1, "c2": "ISK",
                "amount": None}
    return None


def compute_currency(op: str, c1: str, c2: str,
                     amount: "float | None",
                     rates: dict) -> Optional[float]:
    """The reference's cross-rate arithmetic (currency.py:243-265):
    *rates* maps ISO code → value in ISK; ISK itself is 1."""
    xr = dict(rates)
    xr["ISK"] = 1.0

    def rate(a: str, b: str) -> Optional[float]:
        if a == b:
            return 1.0
        if a == "GVT":
            return xr.get("GVT")
        if a in xr and b in xr and xr[b] != 0:
            return xr[a] / xr[b]
        return None

    # the index op asks for the basket value itself (the reference
    # calls _query_exchange_rate("GVT", ""), currency.py:319-321)
    r = rate(c1, "" if op == "index" else c2)
    if r is None:
        return None
    if op == "convert":
        return (amount or 0.0) * r
    return r


def iceformat_float(val: float, decimals: int = 2) -> str:
    """Icelandic number formatting (the reference's iceformat_float):
    thousands separated by '.', decimal ',', trailing zero-decimals
    trimmed ("15.234" not "15.234,00")."""
    txt = f"{val:,.{decimals}f}"
    txt = txt.replace(",", "\x00").replace(".", ",").replace("\x00", ".")
    if "," in txt:
        txt = txt.rstrip("0").rstrip(",")
    return txt


def is_plural_isk(val: float) -> bool:
    """Icelandic plural rule the reference's is_plural applies to
    króna/krónur: singular only for numbers ending in 1 (but not 11);
    any fractional value is plural."""
    if val != int(val):
        return True
    n = abs(int(val))
    return not (n % 10 == 1 and n % 100 != 11)
