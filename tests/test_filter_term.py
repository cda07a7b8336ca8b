"""ES term/terms-filter context over declared docmap keyword fields — the
exact-match restriction the reference's consumers run on country_code /
rank / ruleset_id (osu.ElasticIndexer/schemas/scores.json:17-19,32-37),
here over an include_all_langs index with `lang` declared as a keyword
field. Rank-identity vs the pure-python oracle (which receives the
resolved allowed-doc set), per-query vs docpart parity, serve parity,
multi-generation carry-through, tombstones, and spec validation."""

import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from osu_elastic_indexer_spark import oracle
from osu_elastic_indexer_spark.functions.textprep import extract_text
from osu_elastic_indexer_spark.operators.boolquery import (
    bool_topk,
    bool_topk_docpart,
    index_keyword_fields,
)
from osu_elastic_indexer_spark.operators.build import build_index
from osu_elastic_indexer_spark.sources.catalog import Catalog

from util import assert_rank_identical


@pytest.fixture(scope="module")
def ft_index(spark, corpus_path, tmp_path_factory):
    """All-langs index with the default keyword declaration (lang)."""
    root = str(tmp_path_factory.mktemp("ft_indexes"))
    cat = Catalog(root)
    docs = spark.read.parquet(corpus_path)
    m = build_index(spark, docs, cat, "v1", include_all_langs=True)
    assert m["keyword_fields"] == ["lang"]
    return cat


@pytest.fixture(scope="module")
def ft_oracle(corpus_path, ft_index, spark):
    """(OracleIndex over ALL langs, {field-value: set of docIDs})."""
    rows = spark.read.parquet(ft_index.table_path("v1", "docmap")).collect()
    id_by_url = {r.url: r.doc_id for r in rows}
    lang_docs: dict[str, set] = {}
    tbl = pq.read_table(corpus_path)
    texts = {}
    for u, h, lang in zip(
        tbl["url"].to_pylist(), tbl["html"].to_pylist(), tbl["lang"].to_pylist()
    ):
        if u not in id_by_url:
            continue
        lang_docs.setdefault(lang, set()).add(id_by_url[u])
        t = extract_text(h) or ""
        if t:
            texts[id_by_url[u]] = t
    idx = oracle.build_index(sorted(texts.items()))
    return idx, lang_docs


def _allowed(lang_docs: dict, values) -> set:
    out = set()
    for v in values:
        out |= lang_docs.get(v, set())
    return out


# (engine spec, lang values the filter resolves to)
FT_SPECS = [
    ({"must": "the", "filter_term": {"lang": "de"}}, ("de",)),
    ({"must": "the", "filter_term": {"lang": ["de", "fr"]}}, ("de", "fr")),
    # ES terms query: ANY of the values
    ({"should": "the and", "filter_term": {"lang": "de"}}, ("de",)),
    # zero-score tail: rare should term + filter, msm default 0 -> German
    # docs WITHOUT the term are hits at 0.0 (ADVICE r5 semantics fix)
    ({"should": "w00100", "filter_term": {"lang": "de"}}, ("de",)),
    # explicit msm >= 1 suppresses the tail, as in ES
    (
        {
            "should": "w00100",
            "filter_term": {"lang": "de"},
            "minimum_should_match": 1,
        },
        ("de",),
    ),
    ({"must": "the", "must_not": "w00100", "filter_term": {"lang": "fr"}},
     ("fr",)),
    # term filter composed with a scored filter clause and a range
    ({"filter": "the", "filter_term": {"lang": "de"}}, ("de",)),
    ({"must": "the",
      "filter_term": {"lang": "de"},
      "filter_range": {"url": (None, "https://zz")}}, ("de",)),
]


def _oracle_spec(spec: dict) -> dict:
    return {k: v for k, v in spec.items()
            if k not in ("filter_term", "filter_range")}


def test_filter_term_matches_oracle(spark, ft_index, ft_oracle):
    idx, lang_docs = ft_oracle
    queries = [(qid, spec) for qid, (spec, _v) in enumerate(FT_SPECS)]
    res = bool_topk(spark, ft_index.index_dir("v1"), queries, k=10).collect()
    by_q = {}
    for r in res:
        by_q.setdefault(r.query_id, []).append((r.rank, r.doc_id, r.score))
    for qid, (spec, values) in enumerate(FT_SPECS):
        got = [(d, s) for _rk, d, s in sorted(by_q.get(qid, []))]
        expect = oracle.search_bool(
            idx, _oracle_spec(spec), k=10,
            allowed_docs=_allowed(lang_docs, values),
        )
        assert_rank_identical(got, expect, msg=f"filter_term q{qid} {spec!r}")


def test_filter_term_restricts_but_never_rescores(spark, ft_index):
    """A term filter restricts WHICH docs survive, never a survivor's
    score — bit-identical to the unfiltered query on the same terms."""
    idx_dir = ft_index.index_dir("v1")
    plain = {
        r.doc_id: r.score
        for r in bool_topk(
            spark, idx_dir, [(0, {"must": "the"})], k=10**6
        ).collect()
    }
    filtered = bool_topk(
        spark, idx_dir,
        [(0, {"must": "the", "filter_term": {"lang": "de"}})], k=10**6,
    ).collect()
    assert filtered
    for r in filtered:
        assert plain[r.doc_id] == r.score


def test_filter_term_zero_score_tail_reaches_postingless_docs(
    spark, ft_index, ft_oracle
):
    """ES semantics: with only filter context required and msm 0, a doc
    matching the filter but carrying NONE of the query's terms is a hit at
    score 0.0 — including docs no segment row of the query reaches."""
    idx, lang_docs = ft_oracle
    spec = {"should": "w00100", "filter_term": {"lang": "de"}}
    got = bool_topk(
        spark, ft_index.index_dir("v1"), [(0, spec)], k=10**6
    ).collect()
    got = [(r.doc_id, r.score) for r in sorted(got, key=lambda r: r.rank)]
    allowed = _allowed(lang_docs, ("de",))
    expect = oracle.search_bool(
        idx, {"should": "w00100"}, k=10**6, allowed_docs=allowed
    )
    assert_rank_identical(got, expect, msg="zero-score tail")
    zero_ids = {d for d, s in got if s == 0.0}
    # the tail is non-trivial: German docs without the rare term exist
    assert zero_ids, "expected zero-score German docs"
    assert zero_ids <= allowed
    # and every indexed allowed doc is present (score > 0 or the tail)
    assert {d for d, _ in got} == {d for d in allowed if idx.dl.get(d, 0) > 0}


def test_filter_term_docpart_identical_to_per_query(spark, ft_index):
    """Docpart parity on every spec shape — including the filter-context-
    only-required shape that bool_topk_docpart routes to the per-query
    path (its tail needs docs outside every cell)."""
    idx_dir = ft_index.index_dir("v1")
    queries = [(qid, spec) for qid, (spec, _v) in enumerate(FT_SPECS)]
    a = {
        (r.query_id, r.rank): (r.doc_id, r.score)
        for r in bool_topk(spark, idx_dir, queries, k=10).collect()
    }
    b = {
        (r.query_id, r.rank): (r.doc_id, r.score)
        for r in bool_topk_docpart(spark, idx_dir, queries, k=10).collect()
    }
    assert a == b and a


def test_serve_filter_term_matches_oracle(ft_index, ft_oracle):
    from osu_elastic_indexer_spark.operators.serve import LocalSearcher

    idx, lang_docs = ft_oracle
    s = LocalSearcher(ft_index.index_dir("v1"))
    for _repeat in range(2):  # second pass exercises the docfilter cache
        for qid, (spec, values) in enumerate(FT_SPECS):
            got = s.search_bool(spec, k=10)
            expect = oracle.search_bool(
                idx, _oracle_spec(spec), k=10,
                allowed_docs=_allowed(lang_docs, values),
            )
            assert_rank_identical(got, expect, msg=f"serve ft q{qid} {spec!r}")


def test_filter_term_validation(spark, ft_index, corpus_path, tmp_path_factory):
    idx_dir = ft_index.index_dir("v1")
    assert index_keyword_fields(idx_dir) == ("lang",)
    bad_specs = [
        # undeclared field
        {"must": "the", "filter_term": {"country": "de"}},
        # null never matches an ES term query
        {"must": "the", "filter_term": {"lang": None}},
        {"must": "the", "filter_term": {"lang": []}},
        # filter-context-only: corpus scan, refused like filter_range-only
        {"filter_term": {"lang": "de"}},
        {"must_not": "the", "filter_term": {"lang": "de"}},
        # not a dict
        {"must": "the", "filter_term": ["lang"]},
    ]
    for spec in bad_specs:
        with pytest.raises(ValueError):
            bool_topk(spark, idx_dir, [(0, spec)], k=5).collect()

    # an index built WITHOUT keyword fields refuses lang term filters
    root = str(tmp_path_factory.mktemp("ft_nokw"))
    cat = Catalog(root)
    docs = spark.read.parquet(corpus_path).limit(100)
    m = build_index(spark, docs, cat, "v1", keyword_fields=())
    assert m["keyword_fields"] == []
    with pytest.raises(ValueError, match="filter_term"):
        bool_topk(
            spark, cat.index_dir("v1"),
            [(0, {"must": "the", "filter_term": {"lang": "en"}})], k=5,
        ).collect()
    # reserved / missing columns rejected at build time
    with pytest.raises(ValueError, match="keyword_fields"):
        build_index(spark, docs, cat, "v2", keyword_fields=("url",))
    with pytest.raises(ValueError, match="keyword_fields"):
        build_index(spark, docs, cat, "v2", keyword_fields=("nope",))


def test_filter_term_multigeneration_and_tombstones(
    spark, corpus_path, tmp_path_factory
):
    """Keyword columns must ride every generation's docmap: a German doc
    added incrementally is filterable; a deleted German doc vanishes from
    term-filtered results INCLUDING the zero-score tail."""
    from osu_elastic_indexer_spark.sources.fixtures import evolve_corpus
    from osu_elastic_indexer_spark.streaming.incremental import (
        incremental_update,
    )

    root = str(tmp_path_factory.mktemp("ft_gen"))
    cat = Catalog(root)
    tbl = pq.read_table(corpus_path)
    p0 = os.path.join(root, "c0.parquet")
    pq.write_table(tbl, p0)
    build_index(
        spark, spark.read.parquet(p0), cat, "v1", include_all_langs=True
    )
    idx_dir = cat.index_dir("v1")
    spec = {"must": "the", "filter_term": {"lang": "de"}}
    pre_ids = {
        r.doc_id for r in bool_topk(spark, idx_dir, [(0, spec)], k=10**6).collect()
    }
    assert pre_ids

    tbl2 = evolve_corpus(tbl, n_new=60, n_update=10, n_flip=6)
    p1 = os.path.join(root, "c1.parquet")
    pq.write_table(tbl2, p1)
    m = incremental_update(spark, spark.read.parquet(p1), cat, "v1")
    assert m["generations"] == 2

    dm = spark.read.parquet(cat.table_path("v1", "docmap"))
    assert "lang" in dm.columns
    de_ids = {r.doc_id for r in dm.filter(F.col("lang") == "de").collect()}
    post = bool_topk(spark, idx_dir, [(0, spec)], k=10**6).collect()
    post_ids = {r.doc_id for r in post}
    assert post_ids <= de_ids
    # gen-1 German docs (docIDs past the gen-0 ceiling) are filterable
    assert post_ids - pre_ids, "expected new-generation German matches"

    # docpart parity holds across generations with the term filter
    dp = bool_topk_docpart(spark, idx_dir, [(0, spec)], k=10**6).collect()
    assert {(r.rank, r.doc_id, r.score) for r in dp} == {
        (r.rank, r.doc_id, r.score) for r in post
    }

    # tombstone: delete one matching German url; it must leave both the
    # scored results and the zero-score tail
    victim = sorted(post_ids)[0]
    url_v = dm.filter(F.col("doc_id") == victim).collect()[0].url
    qurls = spark.createDataFrame([(url_v,)], "url string")
    docs2 = spark.read.parquet(p1).filter(F.col("url") != url_v)
    m2 = incremental_update(spark, docs2, cat, "v1", queue_urls=qurls)
    assert m2["counters"]["deletes_total"] >= 1
    for name, q in (
        ("scored", spec),
        ("tail", {"should": "w00100", "filter_term": {"lang": "de"}}),
    ):
        ids = [
            r.doc_id
            for r in bool_topk(spark, idx_dir, [(0, q)], k=10**6).collect()
        ]
        assert victim not in ids, name
        assert ids, name
