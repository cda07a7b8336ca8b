"""Serving tier: LocalSearcher must be rank-identical to the oracle (and
thereby to the Spark WAND path) and answer in milliseconds."""

import time

import pytest

from osu_elastic_indexer_spark import oracle
from osu_elastic_indexer_spark.operators.serve import LocalSearcher
from osu_elastic_indexer_spark.sources.fixtures import reference_queries

from test_index_wand import built_index, oracle_index  # noqa: F401  (fixtures)
from util import assert_rank_identical


@pytest.fixture(scope="module")
def searcher(built_index):  # noqa: F811
    cat, _ = built_index
    return LocalSearcher(cat.index_dir("v1"))


def test_serve_rank_identical(searcher, oracle_index):  # noqa: F811
    for qid, qtext, k in reference_queries():
        got = searcher.search(qtext, k)
        expect = oracle.search(oracle_index, qtext, k)
        assert_rank_identical(got, expect, msg=f"serve q{qid} {qtext!r}")


def test_serve_latency_ms(searcher):
    # warm
    searcher.search("zebra", 10)
    lat = []
    for qid, qtext, k in reference_queries():
        t0 = time.time()
        searcher.search(qtext, k)
        lat.append(time.time() - t0)
    lat.sort()
    p50 = lat[len(lat) // 2]
    assert p50 < 0.25, f"serving p50 {p50:.3f}s — expected milliseconds"


def test_serve_absent_term(searcher):
    assert searcher.search("zzzznotaword", 10) == []


def test_serve_decode_cache_bounded_and_exact(searcher, oracle_index):
    """The decoded-postings cache must (a) return rank-identical results on
    a repeat query (cache-hit path skips the parquet read + decode), and
    (b) stay under its postings budget after eviction."""
    from osu_elastic_indexer_spark.operators import serve as serve_mod

    q = "the zebra data"
    cold = searcher.search(q, 10)
    assert searcher._decoded, "TAAT queries must populate the cache"
    warm = searcher.search(q, 10)
    assert warm == cold
    expect = oracle.search(oracle_index, q, 10)
    assert_rank_identical(warm, expect, msg="decode-cache warm path")

    old_cap = serve_mod._DECODE_CACHE_MAX_POSTINGS
    serve_mod._DECODE_CACHE_MAX_POSTINGS = 1  # force eviction
    try:
        searcher.search("zebra", 5)  # a present term: triggers the bound
        # the bound keeps at least the most-recently-used entry (evicting
        # the term just decoded would buy nothing), evicts everything else
        assert len(searcher._decoded) == 1
    finally:
        serve_mod._DECODE_CACHE_MAX_POSTINGS = old_cap
        searcher._decoded.clear()


def test_serve_decode_cache_lru_eviction_order(searcher):
    """Eviction must remove the least-recently-USED term, not the
    oldest-inserted: a hit moves the entry to the dict tail, so the head
    is always the LRU entry."""
    import numpy as np

    from osu_elastic_indexer_spark.operators import serve as serve_mod

    searcher._decoded.clear()

    def entry(n):
        return (np.arange(n, dtype=np.int64), np.zeros(n))

    searcher._decoded["a"] = entry(4)
    searcher._decoded["b"] = entry(4)
    searcher._decoded["a"] = searcher._decoded.pop("a")  # hit on "a"
    searcher._decoded["c"] = entry(4)
    old_cap = serve_mod._DECODE_CACHE_MAX_POSTINGS
    serve_mod._DECODE_CACHE_MAX_POSTINGS = 8
    try:
        searcher._bound_decode_cache()
        # b (LRU head) evicted; the hit kept "a" alive
        assert set(searcher._decoded) == {"a", "c"}
    finally:
        serve_mod._DECODE_CACHE_MAX_POSTINGS = old_cap
        searcher._decoded.clear()

    # end-to-end: search() itself must move a cache hit to the tail
    searcher.search("zebra", 5)
    searcher.search("data", 5)
    searcher.search("zebra", 5)  # hit
    assert list(searcher._decoded)[-1] == "zebra"
    searcher._decoded.clear()
