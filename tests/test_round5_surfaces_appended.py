"""Exact-stats serving for the round-5 surfaces on an APPENDED,
never-rebuilt store: boolean, prefix and ordered-NEAR must rank
identically to a from-scratch build (the round-4 invariant, extended
to the new query forms). Compared by url because the two stores assign
different doc ids.
"""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from greynirserver_spark.corpus import generate_pages, indexable_stems_by_rank
from greynirserver_spark.plans.lineage import (
    append_pages,
    build_index_checkpointed,
)
from greynirserver_spark.plans.pipeline import query_to_terms
from greynirserver_spark.query.searcher import Searcher


@pytest.fixture(scope="module")
def stores(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("r5app")
    all_pages = generate_pages(spark, 600).cache()
    first = all_pages.where(F.xxhash64("url") % 3 != 0)
    second = all_pages.where(F.xxhash64("url") % 3 == 0)
    inc = build_index_checkpointed(
        spark, first, str(base / "inc"), n_shards=4, with_positions=True
    )
    res = append_pages(spark, inc, second)
    assert res["new_docs"] > 0
    scratch = build_index_checkpointed(
        spark, all_pages, str(base / "scr"), n_shards=4,
        with_positions=True,
    )
    all_pages.unpersist()
    return inc, scratch


def _url_results(spark, store, rows):
    dm = {
        r["doc_id"]: r["url"]
        for r in store.load(spark, "doc_map")
        .select("doc_id", "url").collect()
    }
    return [(dm[d], round(float(v), 9)) for d, v in rows]


def test_boolean_appended_equals_scratch(spark, stores):
    inc, scratch = stores
    s_inc = Searcher(spark, inc)
    s_scr = Searcher(spark, scratch)
    assert s_inc._exact_stats and not s_scr._exact_stats
    stems = indexable_stems_by_rank(12)
    for qi in range(3):
        must = query_to_terms(stems[qi])
        should = query_to_terms(stems[4 + qi])
        must_not = query_to_terms(stems[8 + qi])
        got = _url_results(
            spark, inc,
            s_inc.boolean(must, should=should, must_not=must_not, k=10),
        )
        want = _url_results(
            spark, scratch,
            s_scr.boolean(must, should=should, must_not=must_not, k=10),
        )
        assert got == want, (must, should, must_not)


def test_prefix_appended_equals_scratch(spark, stores):
    inc, scratch = stores
    s_inc = Searcher(spark, inc)
    s_scr = Searcher(spark, scratch)
    stems = indexable_stems_by_rank(4)
    for stem in stems[:3]:
        pre = query_to_terms(stem)[0][:3]
        got = _url_results(spark, inc, s_inc.prefix(pre, k=10))
        want = _url_results(spark, scratch, s_scr.prefix(pre, k=10))
        assert got == want, pre


def test_ordered_near_appended_equals_scratch(spark, stores):
    """Positional counts are stats-independent (no idf in oprox_tf), so
    appended == scratch needs no rescale — but the appended store's
    positional DELTA blocks must decode and chain with the base blocks
    seamlessly."""
    inc, scratch = stores
    s_inc = Searcher(spark, inc)
    s_scr = Searcher(spark, scratch)
    stems = indexable_stems_by_rank(6)
    for qi in range(2):
        words = query_to_terms(" ".join(stems[2 * qi: 2 * qi + 2]))
        got = _url_results(
            spark, inc, s_inc.ordered_near(words, window=8, k=10)
        )
        want = _url_results(
            spark, scratch, s_scr.ordered_near(words, window=8, k=10)
        )
        assert got == want, words


def _crossing_terms(spark, inc, scratch, min_df=3):
    """Terms whose global df crossed min_df AT the append: df >= min_df
    now, but the first build pruned them (old df < min_df)."""
    from greynirserver_spark.operators.postings import load_term_counts

    cur = {
        r["term"]: r["df"]
        for r in load_term_counts(spark, scratch.term_counts).collect()
    }
    # base epoch of the appended store = first-build counts
    import os
    base_dir = sorted(
        d for d in os.listdir(inc.term_counts) if d.startswith("base-")
    )[0]
    first = {
        r["term"]: r["df"]
        for r in spark.read.parquet(
            os.path.join(inc.term_counts, base_dir)
        ).collect()
    }
    return sorted(
        t for t, df in cur.items()
        if df >= min_df and 0 < first.get(t, 0) < min_df
    )


def test_min_df_crossing_term_ranks_identical(spark, stores):
    """THE backfill case: a term df-pruned at first build whose global
    df crossed min_df at the append. Without the crossing backfill its
    base postings are in no block and the appended store silently
    misses those docs; with it, appended == scratch."""
    from greynirserver_spark.plans.lineage import lookup_term_idf
    from greynirserver_spark.operators.wand import wand_topk

    inc, scratch = stores
    crossing = _crossing_terms(spark, inc, scratch)
    assert crossing, "fixture must produce min_df boundary-crossers"
    import os
    assert os.path.isdir(inc.segments_backfill)  # backfill ran

    for t in crossing[:3]:
        idf = lookup_term_idf(spark, inc, [t])
        assert t in idf  # served now (global df >= min_df)
        got = {
            r["doc_id"]: r["score"]
            for r in wand_topk(
                inc.load_segments(spark), [t],
                inc.load(spark, "corpus"), 50, term_idf=idf,
            ).collect()
        }
        want_n = {
            r["doc_id"]
            for r in wand_topk(
                scratch.load_segments(spark), [t],
                scratch.load(spark, "corpus"), 50,
            ).collect()
        }
        # same NUMBER of matching docs (ids differ across stores; the
        # url-level rank identity is covered by the Searcher tests)
        assert len(got) == len(want_n), t
        # and the Searcher path end-to-end by url
        s_inc = Searcher(spark, inc)
        s_scr = Searcher(spark, scratch)
        assert _url_results(spark, inc, s_inc.search([t], 20)) == \
            _url_results(spark, scratch, s_scr.search([t], 20)), t


def test_backfill_crash_replay_no_duplicates(spark, tmp_path_factory):
    """A crash AFTER the backfill write but before the append resolves
    must roll the run dir back by exact name on the next append —
    otherwise the replay would double the crossing terms' base
    postings."""
    import pytest as _pt

    from greynirserver_spark.plans.lineage import append_pages

    base = tmp_path_factory.mktemp("bfcrash")
    all_pages = generate_pages(spark, 600).cache()
    first = all_pages.where(F.xxhash64("url") % 3 != 0)
    second = all_pages.where(F.xxhash64("url") % 3 == 0)
    inc = build_index_checkpointed(
        spark, first, str(base / "inc"), n_shards=4
    )
    with _pt.raises(RuntimeError, match="injected append failure"):
        append_pages(spark, inc, second, fail_after="backfill")
    # retry lands cleanly
    res = append_pages(spark, inc, second)
    assert res["new_docs"] > 0
    scratch = build_index_checkpointed(
        spark, all_pages, str(base / "scr"), n_shards=4
    )
    all_pages.unpersist()
    crossing = _crossing_terms(spark, inc, scratch)
    assert crossing
    s_inc = Searcher(spark, inc)
    s_scr = Searcher(spark, scratch)
    for t in crossing[:3]:
        assert _url_results(spark, inc, s_inc.search([t], 20)) == \
            _url_results(spark, scratch, s_scr.search([t], 20)), t
    # exactly ONE backfill run dir survives (the successful retry's)
    import os
    runs = [d for d in os.listdir(inc.segments_backfill)
            if d.startswith("run=")]
    assert len(runs) == 1


def test_two_append_crossing_backfills_base_only(spark, tmp_path_factory):
    """A term with base df=1 that gains one doc per append crosses
    min_df at the SECOND append. Its append-1 postings already live in
    delta-1 blocks, so the crossing backfill must pull ONLY the base
    postings (doc_id below the existing coverage) — pulling everything
    old would double-count append-1's docs."""
    from greynirserver_spark.plans.lineage import append_pages

    base = tmp_path_factory.mktemp("bf2x")
    all_pages = generate_pages(spark, 900).cache()
    # xxhash64 is SIGNED: pmod, not %, or half the corpus vanishes
    bucket = F.pmod(F.xxhash64("url"), F.lit(3))
    pa = all_pages.where(bucket == 0)
    pb = all_pages.where(bucket == 1)
    pc = all_pages.where(bucket == 2)
    inc = build_index_checkpointed(spark, pa, str(base / "inc"),
                                   n_shards=4)
    append_pages(spark, inc, pb)
    append_pages(spark, inc, pc)
    scratch = build_index_checkpointed(spark, all_pages,
                                       str(base / "scr"), n_shards=4)
    all_pages.unpersist()

    # find terms that crossed at append 2 WITH append-1 participation:
    # df_A>0, df_A+df_B < 3 <= df_A+df_B+df_C, df_B>0
    from greynirserver_spark.operators.postings import load_term_counts

    # simpler: derive per-group dfs from the scratch/inc count stores
    cur = {
        r["term"]: r["df"]
        for r in load_term_counts(spark, scratch.term_counts).collect()
    }
    import os
    base_dir = sorted(
        d for d in os.listdir(inc.term_counts) if d.startswith("base-")
    )[0]
    df_a = {
        r["term"]: r["df"]
        for r in spark.read.parquet(
            os.path.join(inc.term_counts, base_dir)
        ).collect()
    }
    run_dirs = sorted(
        d for d in os.listdir(inc.term_counts) if d.startswith("run=")
    )
    assert len(run_dirs) == 2
    df_b = {
        r["term"]: r["df"]
        for r in spark.read.parquet(
            os.path.join(inc.term_counts, run_dirs[0])
        ).collect()
    }
    two_step = sorted(
        t for t, df in cur.items()
        if df >= 3
        and 0 < df_a.get(t, 0)
        and df_b.get(t, 0) > 0
        and df_a.get(t, 0) + df_b.get(t, 0) < 3
    )
    assert two_step, "fixture must produce a two-append crosser"

    s_inc = Searcher(spark, inc)
    s_scr = Searcher(spark, scratch)
    for t in two_step[:3]:
        got = _url_results(spark, inc, s_inc.search([t], 30))
        want = _url_results(spark, scratch, s_scr.search([t], 30))
        assert got == want, t
        # doc counts equal too (no duplicate => no inflated tf either)
        assert len(got) == len(want) == cur[t]
