"""Follow-up context: the reference's set_context/fetch_context
mechanism (queries/__init__.py:746-794) on the Router."""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from greynirserver_spark.corpus import generate_pages_pdf
from greynirserver_spark.plans.lineage import build_index_checkpointed
from greynirserver_spark.query.router import Router


@pytest.fixture(scope="module")
def ctx_router(spark, tmp_path_factory):
    pages = spark.createDataFrame(generate_pages_pdf(60))
    root = str(tmp_path_factory.mktemp("ctx") / "store")
    store = build_index_checkpointed(spark, pages, root, n_shards=2,
                                     block_size=32)
    return Router(spark, store)


def test_arithmetic_result_context(ctx_router):
    """"hvað er það sinnum 17" resolves 'það' to the previous
    numeric result (reference arithmetic.py:355-364), and the chain
    keeps extending."""
    r = ctx_router
    a = r.execute("hvað er 6 sinnum 7", client_id="c1")
    assert a.qtype == "Arithmetic"
    assert a.df.first()["value"] == 42.0
    b = r.execute("hvað er það sinnum 2", client_id="c1")
    assert b.qtype == "Arithmetic"
    assert b.df.first()["value"] == 84.0
    c = r.execute("hvað er það plús 16", client_id="c1")
    assert c.df.first()["value"] == 100.0
    # fractional results substitute with the decimal comma
    d = r.execute("hvað er 10 deilt með 4", client_id="c1")
    assert d.df.first()["value"] == 2.5
    e = r.execute("hvað er það sinnum 2", client_id="c1")
    assert e.df.first()["value"] == 5.0


def test_tel_pronoun_context(ctx_router):
    r = ctx_router
    # no number on record -> the reference's refusal (tel.py:204-206)
    a = r.execute("hringdu í hann", client_id="fresh")
    assert a.qtype == "Telephone"
    assert a.df.first()["answer"] == "Ég veit ekki við hvern þú átt"
    # call a number, then the pronoun form redials it
    r.execute("hringdu í 588 5522", client_id="c2")
    b = r.execute("hringdu í hann", client_id="c2")
    assert b.df.first()["url"] == "tel:5885522"
    assert b.df.first()["answer"] == "Skal gert"
    # an INVALID number must not enter the context
    r.execute("hringdu í 12", client_id="c3")
    c = r.execute("hringdu í hann", client_id="c3")
    assert c.df.first()["answer"] == "Ég veit ekki við hvern þú átt"


def test_context_is_per_client_and_uncached(ctx_router):
    r = ctx_router
    r.execute("hvað er 5 sinnum 5", client_id="a")
    r.execute("hvað er 3 sinnum 3", client_id="b")
    # same follow-up text, different per-client state — the shared
    # text-keyed cache must not serve one client the other's answer
    va = r.execute("hvað er það plús 1", client_id="a").df.first()
    vb = r.execute("hvað er það plús 1", client_id="b").df.first()
    assert va["value"] == 26.0
    assert vb["value"] == 10.0
    # plain queries are still cached (cache hit returns same rows)
    x1 = r.execute("hvað er 2 plús 2", client_id="a").df.first()
    x2 = r.execute("hvað er 2 plús 2", client_id="b").df.first()
    assert x1["value"] == x2["value"] == 4.0


def test_result_context_without_reference_is_plain_query(ctx_router):
    """'það' with no stored result: the arithmetic parser sees the
    raw text and the query falls through (reference flags
    error_context_reference)."""
    ans = ctx_router.execute("hvað er það sinnum 17",
                             client_id="nobody")
    assert ans.qtype != "Arithmetic"