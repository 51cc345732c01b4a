"""Word qtypes — the reference's `queries/words.py` (spelling +
declension) and `queries/dictionary.py` (dictionary definitions).

* Spelling (`words.py:59-76, 179-200`): "hvernig skrifar maður X?" →
  the word's characters uppercased and space-separated.
* Declension (`words.py:79-172`): "hvernig beygist orðið X?" → the
  four cases "nom, acc, dat, gen" with the "Hér er X, um Y, frá Z,
  til Þ" voice walk-through.  The reference casts through BÍN at
  query time; here the morphology is an injectable (word, nom, acc,
  dat, gen) dimension — the same broadcast-dim architecture the
  tokenizer uses for its category dictionary, and the shape a
  production deployment would materialize from BÍN once.  Unknown
  words get the reference's not-in-BÍN wording.
* Dictionary (`dictionary.py:88-170`): "hvað þýðir orðið X?" →
  definitions from an injectable (word, definition, ord) dimension
  (the reference queries the islenskordabok REST API): one
  definition answers "„X“ er „skýring“", several enumerate
  "1. …\\n2. …" exactly like the reference's formatter.
"""

from __future__ import annotations

import re
from typing import List, Optional

__all__ = [
    "parse_word_query",
    "spelling_answer",
    "declension_answer",
    "dictionary_answer",
    "icequote",
]

# optional word-type qualifier before the subject (words.py:40-57)
_WT = r"(?:orðið|orðinu|orðsins|nafnið|nafninu|nafnsins)?\s*"

_SPELLING_RES = tuple(re.compile(p, re.I) for p in (
    rf"^hvernig (?:stafar|skrifar|ritar) maður {_WT}(.+)$",
    rf"^hvernig (?:stafarðu|skrifarðu|ritarðu) {_WT}(.+)$",
    rf"^hvernig (?:skrifa|rita|stafa) ég {_WT}(.+)$",
    rf"^hvernig skal (?:stafa|stafsetja|skrifa|rita) {_WT}(.+)$",
    rf"^hvernig er {_WT}(.+?) (?:stafsett|skrifað|stafað|ritað)$",
    rf"^hvernig (?:stafast|ritast) {_WT}(.+)$",
))

_DECLENSION_RES = tuple(re.compile(p, re.I) for p in (
    rf"^hvernig (?:beygist|fallbeygist) {_WT}(.+)$",
    rf"^hvernig (?:beygi|fallbeygi) ég {_WT}(.+)$",
    rf"^hvernig (?:beygirðu|fallbeygirðu) {_WT}(.+)$",
    rf"^hvernig (?:beygir|fallbeygir) maður {_WT}(.+)$",
    rf"^hvernig á (?:ég |maður )?að (?:beygja|fallbeygja) {_WT}(.+)$",
    rf"^hvernig skal (?:beygja|fallbeygja) {_WT}(.+)$",
    rf"^hvernig er {_WT}(.+?) (?:beygt|fallbeygt)$",
    rf"^(?:hverjar|hvað|hvernig) eru beygingarmyndir {_WT}(.+)$",
    rf"^fallbeyging á {_WT}(.+)$",
))

_DICTIONARY_RES = tuple(re.compile(p, re.I) for p in (
    rf"^hvað (?:þýðir|merkir) {_WT}(.+)$",
    rf"^hver er orðabók[a]?r?skilgreiningin á {_WT}(.+)$",
    rf"^hvað stendur í orðabókinni um {_WT}(.+)$",
))


def icequote(s: str) -> str:
    """Icelandic quotation marks (the reference's icequote)."""
    return f"„{s}“"


def parse_word_query(q: str) -> Optional[dict]:
    """{op, word} with op ∈ spelling|declension|dictionary, else
    None."""
    s = q.strip().rstrip("?").strip()
    for rx in _SPELLING_RES:
        if m := rx.match(s):
            return {"op": "spelling", "word": m.group(1).strip()}
    for rx in _DECLENSION_RES:
        if m := rx.match(s):
            return {"op": "declension", "word": m.group(1).strip()}
    for rx in _DICTIONARY_RES:
        if m := rx.match(s):
            # the reference takes the first word of a multi-word
            # subject (dictionary.py:91-93)
            return {"op": "dictionary",
                    "word": m.group(1).strip().split()[0]}
    return None


def spelling_answer(word: str) -> dict:
    """words.py:179-200: characters uppercased, space-separated."""
    answ = " ".join(c.upper() for c in word)
    voice = (f"Orðið {icequote(word)} er stafað á eftirfarandi "
             f"hátt: {answ}")
    return {"answer": answ, "voice": voice}


def declension_answer(word: str,
                      forms: "tuple | None") -> dict:
    """words.py:148-172: *forms* is (nom, acc, dat, gen) from the
    morphology dim, or None when the word is not in it."""
    if forms is None:
        nf = (f"Nafnorðið {icequote(word)} fannst ekki í "
              "Beygingarlýsingu íslensks nútímamáls.")
        return {"answer": nf, "voice": nf}
    answ = ", ".join(forms)
    cases = "Hér er {0}, um {1}, frá {2}, til {3}".format(*forms)
    voice = (f"Orðið {icequote(word)} beygist á eftirfarandi "
             f"hátt: {cases}.")
    return {"answer": answ, "voice": voice}


# the reference's enumeration words (dictionary.py _ENUM_WORDS)
_ENUM_WORDS = (
    "fyrsta", "öðru", "þriðja", "fjórða", "fimmta", "sjötta",
    "sjöunda", "áttunda", "níunda", "tíunda",
)


def dictionary_answer(word: str, definitions: List[str]) -> dict:
    """dictionary.py:146-163: single definition quoted inline,
    several enumerated."""
    if not definitions:
        nf = f"Ekki tókst að fletta upp orðinu {icequote(word)}"
        return {"answer": nf, "voice": nf}
    if len(definitions) == 1:
        answ = (f"{icequote(word[:1].upper() + word[1:])} er "
                f"{icequote(definitions[0])}")
        return {"answer": answ, "voice": answ}
    answ = ""
    voice = f"Orðið {icequote(word)} getur þýtt: "
    for i, d in enumerate(definitions[:len(_ENUM_WORDS)]):
        answ += f"{i + 1}. {d}\n"
        voice += f"í {_ENUM_WORDS[i]} lagi, {d}, "
    return {"answer": answ.rstrip(",.\n ") + ".",
            "voice": voice.rstrip(",.\n").strip() + "."}
