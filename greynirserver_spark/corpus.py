"""Deterministic synthetic Common-Crawl-style `pages` corpus (seed 42).

Produces the engine's authoritative input shape (BASELINE.json input_hint):

    pages(url string, warc_ts timestamp, html binary, text string, lang string)

where ``text`` is the *expected* extraction output (the byte-identity
target). The HTML of every page is assembled from template cases that
exercise each extraction rule of the reference (fetcher.py:57-222):
nested blocks, inline-between-blocks, <br>/<hr> cuts, span/img whitespace,
excluded tags, soft hyphens / ZWSP, bracket runs and edge brackets.
Expected text is computed *constructively* from the template — never by
running the extractor — so pages-level tests are not circular.

Vocabulary: ~20k Icelandic-flavored stems under a Zipf(s≈1.07) unigram
distribution (real head-term skew), each with a fixed grammatical category
drawn from the reference's category universe; includes the no-index
stoplist pairs, over-long (>64 char) stems, and hyphen/space stems so the
index filter and key normalization are exercised (FIXTURES.md §2).

Generation is counter-based: doc *i* is generated from
``SeedSequence([seed, i])``, so output is identical regardless of Spark
partitioning — the property that makes the generator usable as a
distributed source (``generate_pages``) at any scale.
"""

from __future__ import annotations

import datetime as dt
from functools import lru_cache
from typing import Iterator, List, Tuple

import numpy as np
import pandas as pd

from .tokenization import NOINDEX_PAIRS

__all__ = [
    "vocabulary",
    "generate_pages_pdf",
    "generate_pages",
    "PAGES_SCHEMA",
    "SEED",
]

SEED = 42
PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)

_ONSETS = (
    "b d f g h j k l m n p r s t v þ st sk br gr hr kl sn tr fj dr fl gl "
    "hn kr pr sl sm sp sv"
).split()
_VOWELS = "a á e é i í o ó u ú y ý æ ö au ei ey".split()
_CODAS = (
    " r ur ar ið inn an um li mi nd rk st tt ng gur nn ll ss rð kk"
).split()
_CODAS = [c if c != " " else "" for c in (" ".join(_CODAS)).split(" ")]

_DOMAINS = [
    "frettir.example.is", "visir.example.is", "mbl.example.is",
    "ruv.example.is", "kjarninn.example.is", "dv.example.is",
    "stundin.example.is", "vb.example.is",
]

_CATS = ["kk", "kvk", "hk", "so", "lo", "entity", "person_kk", "person_kvk",
         "ao", "fs", "st", "gr"]
# ao/fs/st/gr are NOT in CATEGORIES_TO_INDEX -> exercise the category filter
_CAT_WEIGHTS = np.array([18, 16, 14, 16, 12, 6, 3, 3, 5, 4, 2, 1], dtype=float)

_EN_WORDS = (
    "the of and to in a is that for on with as by at from it this was are "
    "be or an news page report world today market data"
).split()

_BASE_TS = dt.datetime(2026, 3, 1, tzinfo=dt.timezone.utc)
_TS_WINDOW_S = 120 * 24 * 3600

_VOCAB_SIZE = 20000
_ZIPF_S = 1.07


@lru_cache(maxsize=1)
def vocabulary() -> pd.DataFrame:
    """The fixed (stem, cat, p) vocabulary table, deterministic for SEED."""
    rng = np.random.Generator(np.random.SFC64(np.random.SeedSequence([SEED, 0])))
    stems: List[str] = []
    seen = set()
    while len(stems) < _VOCAB_SIZE:
        n_syll = rng.integers(1, 4)
        w = ""
        for _ in range(n_syll):
            w += _ONSETS[rng.integers(0, len(_ONSETS))]
            w += _VOWELS[rng.integers(0, len(_VOWELS))]
        w += _CODAS[rng.integers(0, len(_CODAS))]
        if w not in seen and len(w) >= 2:
            seen.add(w)
            stems.append(w)
    cats = rng.choice(len(_CATS), size=_VOCAB_SIZE,
                      p=_CAT_WEIGHTS / _CAT_WEIGHTS.sum())
    cat_col = [_CATS[c] for c in cats]

    # Splice in special cases at deterministic slots:
    # stoplist pairs (must be filtered by the index filter)
    for i, (stem, cat) in enumerate(NOINDEX_PAIRS):
        stems[i * 7] = stem.lower()
        cat_col[i * 7] = cat
    # over-long stems (>64 chars; must be dropped, article.py:339-341)
    for j in range(3):
        k = 701 + j * 97
        stems[k] = ("ofur" + stems[k]) * 8
        cat_col[k] = "hk"
    # hyphen / space stems (exercise key normalization, builder.py:80-82)
    stems[997], cat_col[997] = "tölvu-póstur", "kk"
    stems[1013], cat_col[1013] = "hægri grænir", "entity"

    # Dedup after splicing (keep first occurrence's rank)
    dedup_seen = set()
    for idx in range(len(stems)):
        if stems[idx] in dedup_seen:
            stems[idx] = stems[idx] + f"x{idx}"
        dedup_seen.add(stems[idx])

    ranks = np.arange(1, _VOCAB_SIZE + 1, dtype=float)
    p = 1.0 / np.power(ranks + 2.7, _ZIPF_S)
    p /= p.sum()
    return pd.DataFrame({"stem": stems, "cat": cat_col, "p": p})


def indexable_stems_by_rank(n: int = 50, start_rank: int = 0) -> List[str]:
    """The *n* highest-probability stems (from *start_rank*) that survive
    the index filter — i.e. stems a realistic query would contain. Skips
    stoplist pairs, non-indexed categories and over-long stems."""
    from .tokenization import CATEGORIES_TO_INDEX, MAX_WORD_LEN, NOINDEX_PAIRS

    noindex = {(s.lower(), c) for s, c in NOINDEX_PAIRS}
    v = vocabulary()
    out: List[str] = []
    for i in range(start_rank, len(v)):
        stem, cat = v["stem"].iloc[i], v["cat"].iloc[i]
        if (
            cat in CATEGORIES_TO_INDEX
            and (stem, cat) not in noindex
            and len(stem) <= MAX_WORD_LEN
            and " " not in stem
            and "-" not in stem
        ):
            out.append(stem)
            if len(out) == n:
                break
    return out


@lru_cache(maxsize=1)
def _vocab_arrays() -> Tuple[np.ndarray, np.ndarray]:
    v = vocabulary()
    cdf = np.cumsum(v["p"].to_numpy())
    cdf[-1] = 1.0
    return v["stem"].to_numpy(), cdf


def _sample_words(rng: np.random.Generator, n: int) -> np.ndarray:
    stems, cdf = _vocab_arrays()
    u = rng.random(n)
    return stems[np.searchsorted(cdf, u, side="left")]


def _make_sentence(words: np.ndarray) -> str:
    s = " ".join(words.tolist())
    return s[:1].upper() + s[1:] + "."


def _make_paragraph(rng: np.random.Generator) -> str:
    n_sent = int(rng.integers(2, 6))
    sents = []
    for _ in range(n_sent):
        n_words = int(rng.integers(5, 15))
        sents.append(_make_sentence(_sample_words(rng, n_words)))
    return " ".join(sents)


def _marker(p: str) -> str:
    """Wrap cleaned paragraph content in markers with the reference's
    edge-bracket padding (fetcher.py:174-181)."""
    head = " " if p.startswith("[") else ""
    tail = " " if p.endswith("]") else ""
    return "[[" + head + p + tail + "]]"


def _render_templates(
    rng: np.random.Generator, paras: List[str]
) -> Tuple[List[str], List[str]]:
    """Consume paragraphs through randomly chosen HTML templates.

    Returns (html_fragments, expected_paragraph_contents). Expected content
    is derived constructively per template rule — see module docstring.
    """
    html: List[str] = []
    expected: List[str] = []
    i = 0
    while i < len(paras):
        t = int(rng.integers(0, 10))
        p = paras[i]
        if t == 0 and i + 1 < len(paras):
            q = paras[i + 1]
            html.append(f"<div><p>{p}</p><p>{q}</p></div>")
            expected += [p, q]
            i += 2
        elif t == 1 and i + 1 < len(paras):
            q = paras[i + 1]
            lead = _make_sentence(_sample_words(rng, 4))
            html.append(f"<div>{lead} <p>{p}</p> {q}</div>")
            expected += [lead, p, q]
            i += 2
        elif t == 2:
            cut = p.find(". ")
            if 0 < cut < len(p) - 2:
                a, b = p[: cut + 1], p[cut + 2:]
                html.append(f"<p>{a}<br>{b}</p>")
                expected += [a, b]
            else:
                html.append(f"<p>{p}</p>")
                expected.append(p)
            i += 1
        elif t == 3:
            w = _sample_words(rng, 3)
            html.append(f"<p>{p}<span>{w[0]} {w[1]}</span>{w[2]}</p>")
            expected.append(f"{p} {w[0]} {w[1]} {w[2]}")
            i += 1
        elif t == 4:
            cut = p.find(" ")
            a, b = p[:cut], p[cut + 1:]
            html.append(f'<p>{a}<img src="mynd.jpg">{b}</p>')
            expected.append(f"{a} {b}")
            i += 1
        elif t == 5:
            html.append(f"<script>var x = {int(rng.integers(0, 99))};</script><p>{p}</p>")
            expected.append(p)
            i += 1
        elif t == 6:
            # soft hyphen + ZWSP injected mid-paragraph; removed on extract
            cut = len(p) // 2
            html.append(f"<p>{p[:cut]}­​{p[cut:]}</p>")
            expected.append(p)
            i += 1
        elif t == 7:
            w = str(_sample_words(rng, 1)[0])
            html.append(f"<p>Sjá [[{w}]] í {p}</p>")
            expected.append(f"Sjá [{w}] í {p}")
            i += 1
        elif t == 8:
            html.append(f"<h2>{p.split('.')[0]}.</h2><p>{p}</p>")
            expected += [p.split(".")[0] + ".", p]
            i += 1
        else:
            html.append(f"<p>{p}</p>")
            expected.append(p)
            i += 1
    return html, expected


def _gen_one(doc_idx: int, seed: int = SEED) -> Tuple[str, dt.datetime, bytes, str, str]:
    rng = np.random.Generator(
        np.random.SFC64(np.random.SeedSequence([seed, 1, doc_idx]))
    )
    lang_u = rng.random()
    lang = "is" if lang_u < 0.95 else ("en" if lang_u < 0.99 else "")
    ts = _BASE_TS + dt.timedelta(seconds=float(rng.random() * _TS_WINDOW_S))
    domain = _DOMAINS[int(rng.integers(0, len(_DOMAINS)))]
    slug_words = _sample_words(rng, 2)
    url = (
        f"https://{domain}/{ts.year}/{ts.month:02d}/"
        f"{slug_words[0]}-{slug_words[1]}-{doc_idx}"
    )
    if lang == "is":
        n_paras = max(2, int(rng.lognormal(1.9, 0.5)))
        paras = [_make_paragraph(rng) for _ in range(n_paras)]
        frags, expected = _render_templates(rng, paras)
        body = "".join(frags)
        text = "".join(_marker(p) for p in expected)
    else:
        n = int(rng.integers(20, 80))
        idx = rng.integers(0, len(_EN_WORDS), size=n)
        body_txt = " ".join(_EN_WORDS[j] for j in idx)
        body = f"<p>{body_txt}</p>"
        text = _marker(body_txt)
    html = (
        f"<html><head><title>{slug_words[0]}</title></head>"
        f"<body><article>{body}</article></body></html>"
    ).encode("utf-8")
    return url, ts, html, text, lang


def generate_pages_pdf(n_docs: int, start: int = 0, seed: int = SEED) -> pd.DataFrame:
    """Generate docs [start, start+n_docs) as a pandas DataFrame."""
    rows = [_gen_one(i, seed) for i in range(start, start + n_docs)]
    df = pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])
    df["warc_ts"] = pd.to_datetime(df["warc_ts"], utc=True).dt.tz_localize(None)
    return df


def generate_pages(spark, n_docs: int, num_partitions: int = 0, seed: int = SEED):
    """Distributed generator: counter-based RNG makes the output identical
    for any partition count — this is the scale path (no driver-side data).
    """
    num_partitions = num_partitions or max(8, n_docs // 2000)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids = b["id"].to_numpy()
            if len(ids):
                rows = [_gen_one(int(i), seed) for i in ids]
                out = pd.DataFrame(
                    rows, columns=["url", "warc_ts", "html", "text", "lang"]
                )
                out["warc_ts"] = pd.to_datetime(
                    out["warc_ts"], utc=True
                ).dt.tz_localize(None)
                yield out

    return (
        spark.range(0, n_docs, 1, num_partitions)
        .mapInPandas(gen, PAGES_SCHEMA)
    )
