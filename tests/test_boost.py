"""ES per-clause ``boost`` on the bool surface — clause items as
``{"query": text, "boost": factor}`` dicts / ``(text, factor)`` pairs
(boolquery._normalize_spec), folded into the per-(query, term) idf every
scoring tier already carries. Covers: exact arithmetic vs the unboosted
scores, per-query/docpart/serve tier identity, the product rule for a
term boosted in several clauses, unboosted-spec invariance, validation,
and the CLI caret syntax ("term^2.5")."""

import pytest

from osu_elastic_indexer_spark.cli import _parse_boosted
from osu_elastic_indexer_spark.operators.boolquery import (
    _normalize_spec,
    bool_topk,
    bool_topk_docpart,
)
from osu_elastic_indexer_spark.operators.build import build_index
from osu_elastic_indexer_spark.operators.serve import LocalSearcher
from osu_elastic_indexer_spark.sources.catalog import Catalog


@pytest.fixture(scope="module")
def boost_index(spark, corpus_path, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("boost_indexes"))
    cat = Catalog(root)
    build_index(spark, spark.read.parquet(corpus_path), cat, "v1")
    return cat.index_dir("v1")


def test_normalize_spec_boost_forms():
    s = _normalize_spec({
        "must": [{"query": "hash join", "boost": 2.0}],
        "should": [("merge", 3.0), "scan"],
    })
    assert s["must"] == ["hash", "join"]
    assert s["should"] == ["merge", "scan"]
    assert s["boosts"] == {"hash": 2.0, "join": 2.0, "merge": 3.0}
    # unboosted specs carry an EMPTY map (scores bit-identical to before)
    assert _normalize_spec({"must": "a", "should": ["b", "c"]})["boosts"] == {}
    # plain tuples of texts still mean "several texts", not a boost pair
    assert _normalize_spec({"must": ("a", "b")})["must"] == ["a", "b"]


def test_normalize_spec_boost_product_rule():
    """A term deduped across several scored clauses multiplies their
    boosts (the engine's one-contribution-per-term analog of ES's
    per-clause score sum)."""
    s = _normalize_spec({
        "must": [{"query": "zebra", "boost": 2.0}],
        "should": [{"query": "zebra", "boost": 3.0}],
    })
    assert s["boosts"] == {"zebra": 6.0}


def test_boost_validation():
    with pytest.raises(ValueError, match="boost must be > 0"):
        _normalize_spec({"must": [{"query": "a", "boost": 0.0}]})
    with pytest.raises(ValueError, match="no effect"):
        _normalize_spec({"must_not": [{"query": "a", "boost": 2.0}]})
    with pytest.raises(ValueError, match="no effect"):
        _normalize_spec({"filter": [("a", 2.0)]})
    with pytest.raises(ValueError, match="clause item"):
        _normalize_spec({"must": [{"boost": 2.0}]})
    with pytest.raises(ValueError, match="clause item"):
        _normalize_spec({"must": [{"query": "a", "bosst": 2.0}]})


def test_boost_exact_arithmetic(boost_index):
    """boosted(must x, should y^B) == score(x) + B * y-contribution for
    every hit — measured on the serving tier (exact float repro)."""
    ls = LocalSearcher(boost_index)
    B = 3.0
    base = dict(ls.search_bool({"must": "the", "should": "zebra"}, 10**6))
    the_only = dict(ls.search_bool({"must": "the"}, 10**6))
    boosted = dict(ls.search_bool(
        {"must": "the", "should": [{"query": "zebra", "boost": B}]}, 10**6
    ))
    assert set(boosted) == set(base)
    changed = 0
    for d, s in boosted.items():
        want = the_only.get(d, 0.0) + B * (base[d] - the_only.get(d, 0.0))
        assert abs(s - want) < 1e-9
        changed += base[d] != s
    assert changed, "boost must move at least one co-occurring doc"


def test_boost_tier_identity(spark, boost_index):
    """per-query Spark, docpart Spark, and serve produce the same
    (doc_id, score) set under boost."""
    spec = {
        "must": "the",
        "should": [{"query": "zebra", "boost": 2.5}, ("needlepair", 4.0)],
    }
    pq_rows = {
        (r.doc_id, round(r.score, 9))
        for r in bool_topk(spark, boost_index, [(0, spec)], 20).collect()
    }
    dp_rows = {
        (r.doc_id, round(r.score, 9))
        for r in bool_topk_docpart(
            spark, boost_index, [(0, spec)], 20
        ).collect()
    }
    sv_rows = {
        (d, round(s, 9))
        for d, s in LocalSearcher(boost_index).search_bool(spec, 20)
    }
    assert pq_rows == dp_rows == sv_rows and pq_rows


def test_parse_boosted_caret_syntax():
    assert _parse_boosted(None) is None
    assert _parse_boosted("plain text") == "plain text"
    assert _parse_boosted("merge^2.5") == [{"query": "merge", "boost": 2.5}]
    assert _parse_boosted("merge^2.5 scan") == [
        {"query": "merge", "boost": 2.5}, "scan",
    ]
    # non-numeric after ^ stays literal text (the tokenizer strips it)
    assert _parse_boosted("a^b") == "a^b"
