"""Golden byte-identity tests for HTML -> text extraction.

Expected strings mirror the reference engine's own golden tests
(/root/reference/tests/test_fetcher.py:69-195) — these define the per-row
invariant "byte-identical extracted text per url" (BASELINE.json).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from greynirserver_spark.extraction import (
    WELL_FORMED_RE,
    extract_document,
    extract_fragment,
)


def test_simple_paragraphs():
    assert extract_fragment("<p>Fyrsta málsgrein.</p><p>Önnur málsgrein.</p>") == (
        "[[Fyrsta málsgrein.]][[Önnur málsgrein.]]"
    )
    assert extract_fragment("<div><p>Fyrsta.</p><p>Önnur.</p></div>") == (
        "[[Fyrsta.]][[Önnur.]]"
    )
    assert extract_fragment("<p></p><div> </div><p>Texti.</p>") == "[[Texti.]]"
    assert extract_fragment("") == ""


def test_inline_text_between_blocks():
    assert extract_fragment(
        "<div>Inngangur hér. <p>Málsgrein.</p> Lokaorð hér.</div>"
    ) == "[[Inngangur hér.]][[Málsgrein.]][[Lokaorð hér.]]"
    assert extract_fragment("<p>Fyrsta.</p>Millitexti án umbúða.<p>Önnur.</p>") == (
        "[[Fyrsta.]][[Millitexti án umbúða.]][[Önnur.]]"
    )
    assert extract_fragment(
        "Hann sagði margt.<figure><figcaption>Mynd af manni.</figcaption></figure>"
    ) == "[[Hann sagði margt.]][[Mynd af manni.]]"
    assert extract_fragment(
        "<blockquote><p>Tweet content here.</p></blockquote>- Reuters (@Reuters)"
    ) == "[[Tweet content here.]][[- Reuters (@Reuters)]]"


def test_break_tags():
    assert extract_fragment("<p>Fyrri hluti.<br>Seinni hluti.</p>") == (
        "[[Fyrri hluti.]][[Seinni hluti.]]"
    )
    assert extract_fragment("<br><p>Texti.</p><br>") == "[[Texti.]]"
    assert extract_fragment("<p>Fyrri.<br><br><hr>Seinni.</p>") == (
        "[[Fyrri.]][[Seinni.]]"
    )


def test_inline_elements():
    assert extract_fragment("<p>fyrir<span>miðjan</span>eftir</p>") == (
        "[[fyrir miðjan eftir]]"
    )
    assert extract_fragment("<p>fyrir<img src='x.jpg'>eftir</p>") == "[[fyrir eftir]]"
    assert extract_fragment("<p>Hann <b>sagði</b> margt.</p>") == (
        "[[Hann sagði margt.]]"
    )


def test_excluded_tags():
    assert extract_fragment(
        "<p>Sýnilegt.</p><script>var x = 1;</script><style>p{}</style>"
        "<audio>hljóð</audio><video>mynd</video><p>Líka sýnilegt.</p>"
    ) == "[[Sýnilegt.]][[Líka sýnilegt.]]"


def test_soft_hyphen_and_zwsp_removed():
    assert extract_fragment("<p>mál­sgrein og orð​.</p>") == (
        "[[málsgrein og orð.]]"
    )


def test_whitespace_collapse():
    assert extract_fragment("<p>  mörg   \n\t bil  hér </p>") == "[[mörg bil hér]]"


def test_literal_brackets_in_content():
    assert extract_fragment("<p>Sjá [mynd] hér.</p>") == "[[Sjá [mynd] hér.]]"
    assert extract_fragment("<p>Sjá [[skrýtna]] hornklofa.</p>") == (
        "[[Sjá [skrýtna] hornklofa.]]"
    )
    assert extract_fragment("<p>[[[þrefalt]]]</p>") == "[[ [þrefalt] ]]"
    assert extract_fragment("<p>[hornklofi fremst</p>") == "[[ [hornklofi fremst]]"
    assert extract_fragment("<p>hornklofi aftast]</p>") == "[[hornklofi aftast] ]]"
    # Head padding applies only to leading '[', tail padding only to
    # trailing ']' — neither "a[" nor "]b" gets a pad (fetcher.py:178-179)
    assert extract_fragment("<p>a[</p><p>]b</p>") == "[[a[]][[]b]]"
    assert WELL_FORMED_RE.match(extract_fragment("<p>a[</p><p>]b</p>"))


def test_marker_invariant_gnarly_inputs():
    cases = [
        "<p>Venjulegt.</p>",
        "<div>Texti <p>innri</p> meira <p>enn innri</p> loka</div>",
        "<div><div><div>djúpt</div></div></div>",
        "texti á rótarstigi",
        "<br>",
        "<br>texti eftir br",
        "<div><br></div>",
        "<table><tr><td>reitur eitt</td><td>reitur tvö</td></tr></table>",
        "<ul><li>fyrsti</li><li>annar <p>með málsgrein</p> eftirmáli</li></ul>",
        "fyrir<figure><figcaption>myndatexti</figcaption></figure>eftir",
        "<blockquote>tíst</blockquote>- Höfundur (@notandi) 4. ágúst 2026",
        "<p>fyrri</p>millitexti<p>seinni</p>",
        "<div>a<p>b</p>c<p>d</p>e</div>",
        "<span>bara span</span>",
        "<p><span>span í p</span></p>",
        "<h1>Fyrirsögn</h1>texti<h2>Millifyrirsögn</h2>meiri texti",
        "<p>ólokað <b>feitletur</p><p>næsta</p>",
        "<p>entity &amp; stöff &lt;ekki tag&gt;</p>",
        "<!-- athugasemd --><p>texti</p><!-- önnur -->",
    ]
    for html in cases:
        text = extract_fragment(html)
        assert WELL_FORMED_RE.match(text), f"Malformed markers for {html!r}: {text!r}"


def test_document_path_requires_html_body():
    # Production path mirrors reference fetcher.py:311-314: soup.html.body
    assert extract_document("<p>engin html rót</p>") == ""
    assert extract_document(
        "<html><head><title>x</title></head><body><p>Texti.</p></body></html>"
    ) == "[[Texti.]]"
    assert extract_document(
        b"<html><body><p>B\xc3\xbdti.</p></body></html>"
    ) == "[[Býti.]]"
    assert extract_document(None) == ""


def test_head_title_not_extracted_in_document_path():
    out = extract_document(
        "<html><head><title>Titill</title><style>a{}</style></head>"
        "<body><div><p>Efni.</p></div></body></html>"
    )
    assert out == "[[Efni.]]"
