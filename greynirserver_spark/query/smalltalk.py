"""Small command qtypes — the reference's counting, random-number,
repeat ("parrot"), telephone and Yule-lads modules, as plain parsers
+ answer builders the Router turns into 1-row answer frames.

Reference behaviors mirrored:

* Counting (`queries/counting.py:97-121`): "teldu upp að N" → 1…N,
  "teldu niður frá N" → N−1…0 (the reference's ``range(0, n)[::-1]``),
  "teldu frá N upp að M" → min…max; ranges beyond _MAX_COUNT=100 get
  the "Ég nenni ekki að telja svona lengi." refusal; the display
  answer is "first…last".
* Random (`queries/rand.py:104-135`): "veldu tölu milli x og y" →
  randint over the sorted pair, "kastaðu (N hliða) teningi" →
  randint(1, N) with the zero-sided-die refusal, "fiskur eða
  skjaldarmerki" → coin flip.  The RNG is injectable so answers are
  deterministic in tests (the reference uses the global `random`).
* Parrot (`queries/repeat.py:41-75`): "endurtaktu X" / "segðu
  setninguna X" → X with the first letter capitalized.
* Telephone (`queries/tel.py:53-235`): "hringdu í <númer>" → digits
  stripped of separators; fewer than 3 digits is "{n} er ekki gilt
  símanúmer."; otherwise answer "Skal gert" and a tel: URL for the
  client.
* YuleLads (`queries/yulelads.py:56-175`): the 13-lad December
  arrival table — by name ("hvenær kemur Askasleikir" → "... kemur
  til byggða aðfaranótt 17. desember.") and by date ("hvaða
  jólasveinn kemur 15. desember"), with the reference's
  no-lad-that-day and invalid-date wordings.
"""

from __future__ import annotations

import re
from typing import Optional

__all__ = [
    "parse_counting_query",
    "parse_random_query",
    "answer_random",
    "parse_repeat_query",
    "parse_tel_query",
    "parse_yulelads_query",
    "MAX_COUNT",
    "YULE_LADS_BY_DATE",
]

MAX_COUNT = 100  # reference counting.py:90

# ------------------------------------------------------------ counting

_COUNT_UP_RE = re.compile(r"^teldu(?: nú)? upp að (\d+)\s*$", re.I)
_COUNT_DOWN_RE = re.compile(r"^teldu niður frá (\d+)\s*$", re.I)
_COUNT_BETWEEN_RE = re.compile(
    r"^teldu frá (\d+) (?:upp|niður) að (\d+)\s*$", re.I
)


def parse_counting_query(q: str) -> Optional[dict]:
    """{qkey, first, last, answer} for a counting command, else None.
    The refusal for over-long ranges is folded in here (the range is
    known at parse time)."""
    s = q.strip().rstrip("?").strip()
    if m := _COUNT_UP_RE.match(s):
        first, last = 1, int(m.group(1))
        qkey = "CountUp"
    elif m := _COUNT_DOWN_RE.match(s):
        # range(0, n)[::-1]: counting down from N starts at N-1
        first, last = int(m.group(1)) - 1, 0
        qkey = "CountDown"
    elif m := _COUNT_BETWEEN_RE.match(s):
        a, b = sorted((int(m.group(1)), int(m.group(2))))
        first, last = a, b
        qkey = "CountBetween"
    else:
        return None
    n = abs(last - first) + 1
    if n > MAX_COUNT:
        answer = "Ég nenni ekki að telja svona lengi."
    else:
        answer = f"{first}…{last}"
    return {"qkey": qkey, "first": first, "last": last,
            "answer": answer}


# -------------------------------------------------------------- random

_RAND_BETWEEN_RE = re.compile(
    r"^(?:veldu|nefndu|veldu fyrir mig|gefðu mér)"
    r"(?: af handahófi)? tölu(?: af handahófi)? (?:á )?milli "
    r"(\d+) og (\d+)\s*$",
    re.I,
)
_DIE_RE = re.compile(
    r"^kastaðu(?: upp á)?(?: (\d+) hliða)? (?:teningi|teningnum)\s*$",
    re.I,
)
_COIN_RE = re.compile(
    r"^(?:fiskur eða skjaldarmerki|skjaldarmerki eða fiskur)\s*$",
    re.I,
)


def parse_random_query(q: str) -> Optional[dict]:
    """{action, num1, num2} for a randomness request, else None."""
    s = q.strip().rstrip("?").strip()
    if m := _RAND_BETWEEN_RE.match(s):
        n1, n2 = sorted((int(m.group(1)), int(m.group(2))))
        return {"action": "number", "num1": n1, "num2": n2}
    if m := _DIE_RE.match(s):
        sides = int(m.group(1)) if m.group(1) else 6
        return {"action": "dieroll", "num1": 1, "num2": sides}
    if _COIN_RE.match(s):
        return {"action": "headstails", "num1": 0, "num2": 1}
    return None


def answer_random(parsed: dict, rng) -> dict:
    """{qkey, answer, voice} from a parsed randomness request; *rng*
    is any object with randint/choice (rand.py:104-135)."""
    act = parsed["action"]
    if act == "headstails":
        pick = rng.choice(("Skjaldarmerki", "Fiskur"))
        return {"qkey": "HeadsOrTails", "answer": pick,
                "voice": pick}
    n1, n2 = parsed["num1"], parsed["num2"]
    if act == "dieroll" and n2 == 0:
        ans = "Núll hliða teningar eru ekki til."
        return {"qkey": "0-0", "answer": ans, "voice": ans}
    val = rng.randint(n1, n2)
    voice = (f"Talan {val} kom upp á teningnum"
             if act == "dieroll" else f"Ég vel töluna {val}")
    return {"qkey": f"{n1}-{n2}", "answer": str(val),
            "voice": voice}


# -------------------------------------------------------------- parrot

_REPEAT_PREFIXES = (
    "segðu eftirfarandi orð",
    "segðu orðið",
    "segðu orðin",
    "segðu setninguna",
    "segðu eftirfarandi setningu",
    "segðu eftirfarandi",
    "farðu með setninguna",
    "endurtaktu eftirfarandi setningu",
    "endurtaktu eftirfarandi orð",
    "endurtaktu eftirfarandi",
    "endurtaktu setninguna",
    "endurtaktu orðið",
    "endurtaktu orðin",
    "endurtaktu",
    "hermdu eftir mér",
)


def parse_repeat_query(q: str) -> Optional[dict]:
    """{answer} echoing the rest of the command, first letter
    capitalized (repeat.py:68-75); None when nothing follows the
    prefix."""
    ql = q.strip().rstrip("?")
    low = ql.lower()
    for p in _REPEAT_PREFIXES:
        pfx = p + " "
        if low.startswith(pfx) and len(ql) > len(pfx):
            txt = ql[len(pfx):].strip()
            return {"answer": txt[:1].upper() + txt[1:]}
    return None


# ----------------------------------------------------------- telephone

_TEL_RE = re.compile(
    r"^(?:vinsamlegast )?"
    r"(?:hringdu|(?:geturðu|getur þú) hringt|"
    r"(?:nennirðu|nennir þú) að hringja|"
    r"(?:værirðu|værir þú) til í að hringja)"
    r"(?: fyrir mig)? í "
    r"(?:síma |símanúmerið |símanúmer |númerið |númer )?"
    r"([\d\-\s]+)$",
    re.I,
)


def parse_tel_query(q: str) -> Optional[dict]:
    """{number, answer, url} for a call command (tel.py:187-235)."""
    s = q.strip().rstrip("?").strip()
    m = _TEL_RE.match(s)
    if not m:
        return None
    raw = m.group(1).strip()
    clean = re.sub(r"[^0-9]", "", raw)
    if len(clean) < 3:  # Icelandic numbers have >= 3 digits
        return {"number": clean,
                "answer": f"{raw} er ekki gilt símanúmer.",
                "url": None}
    return {"number": clean, "answer": "Skal gert",
            "url": f"tel:{clean}"}


# ----------------------------------------------------------- yule lads

YULE_LADS_BY_DATE = {
    12: "Stekkjarstaur", 13: "Giljagaur", 14: "Stúfur",
    15: "Þvörusleikir", 16: "Pottasleikir", 17: "Askasleikir",
    18: "Hurðaskellir", 19: "Skyrgámur", 20: "Bjúgnakrækir",
    21: "Gluggagægir", 22: "Gáttaþefur", 23: "Ketkrókur",
    24: "Kertasníkir",
}

# accepted name variants (yulelads.py:57-74) -> canonical date
_YULE_BY_NAME = {name.lower(): d
                 for d, name in YULE_LADS_BY_DATE.items()}
_YULE_BY_NAME.update({
    "stekkjastaur": 12, "pottaskefill": 16, "skyrjarmur": 19,
    "hurðaskelli": 18, "hurðaskell": 18,
})

_ORDINALS = {
    "fyrsta": 1, "annan": 2, "þriðja": 3, "fjórða": 4, "fimmta": 5,
    "sjötta": 6, "sjöunda": 7, "áttunda": 8, "níunda": 9,
    "tíunda": 10, "ellefta": 11, "tólfta": 12, "þrettánda": 13,
    "fjórtánda": 14, "fimmtánda": 15, "sextánda": 16,
    "sautjánda": 17, "átjánda": 18, "nítjánda": 19, "tuttugasta": 20,
    "tuttugasta og fyrsta": 21, "tuttugasta og annan": 22,
    "tuttugasta og þriðja": 23, "tuttugasta og fjórða": 24,
    "tuttugasta og fimmta": 25,
}

_YULE_WHEN_RE = re.compile(
    r"^hvenær (?:kemur|er von á)\s+(.+?)"
    r"(?:\s+til byggða)?\s*$",
    re.I,
)
_YULE_WHO_RE = re.compile(
    r"^hvaða jólasveinn kemur(?: til byggða)?(?: þann)?\s+"
    r"(?:(\d+)\.?|([a-záðéíóúýþæö ]+?))\s*(?:\.\s*)?desember\s*$",
    re.I,
)


def parse_yulelads_query(q: str) -> Optional[dict]:
    """{qkey, answer} for a Yule-lad question, else None
    (yulelads.py sentence())."""
    s = q.strip().rstrip("?").strip()
    if m := _YULE_WHO_RE.match(s):
        if m.group(1):
            day = int(m.group(1))
        else:
            day = _ORDINALS.get(m.group(2).strip().lower())
            if day is None:
                return None
        if day < 1 or day > 31:
            return {"qkey": "YuleLad",
                    "answer": "Þetta er ekki gildur mánaðardagur."}
        lad = YULE_LADS_BY_DATE.get(day)
        if lad is None:
            return {"qkey": "YuleLad",
                    "answer": ("Enginn jólasveinn kemur til byggða "
                               f"þann {day}. desember.")}
        return {"qkey": "YuleLad",
                "answer": (f"{lad} kemur til byggða aðfaranótt "
                           f"{day}. desember.")}
    if m := _YULE_WHEN_RE.match(s):
        subj = m.group(1).strip().lower()
        if subj in ("fyrsti jólasveinninn", "fyrsti jólasveinn"):
            day = 12
            lad = YULE_LADS_BY_DATE[12]
        else:
            day = _YULE_BY_NAME.get(subj)
            if day is None:
                return None
            lad = YULE_LADS_BY_DATE[day]
        return {"qkey": "YuleDate",
                "answer": (f"{lad} kemur til byggða aðfaranótt "
                           f"{day}. desember.")}
    return None
