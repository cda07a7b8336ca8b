"""ES ``sort`` query over stored docmap fields (operators/sortquery) — the
leaderboard shape the reference's consumers run on the scores index (sort
by numeric doc-value fields like total_score/pp with keyword filters;
osu.ElasticIndexer/schemas/scores.json declares those fields for exactly
this). Covers: desc/asc vs a pandas twin, nulls-last (ES missing:_last),
filter_term/filter_range context, serve parity, numeric filter_range on
the bool surface, multi-generation + tombstones, validation, and the
physical plan (pushed filters + TakeOrderedAndProject, no global sort)."""

import os

import numpy as np
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from osu_elastic_indexer_spark.operators.boolquery import bool_topk
from osu_elastic_indexer_spark.operators.build import build_index
from osu_elastic_indexer_spark.operators.serve import LocalSearcher
from osu_elastic_indexer_spark.operators.sortquery import (
    sort_topk,
    sortable_fields,
)
from osu_elastic_indexer_spark.sources.catalog import Catalog


def _with_numeric(docs):
    """Deterministic numeric doc-value column with a null stripe (docs
    whose html length is divisible by 37 carry no value — the ES
    missing-field case)."""
    n = F.length("html").cast("double")
    return docs.withColumn(
        "page_bytes", F.when(F.length("html") % 37 != 0, n)
    )


@pytest.fixture(scope="module")
def sort_index(spark, corpus_path, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("sort_indexes"))
    cat = Catalog(root)
    docs = _with_numeric(spark.read.parquet(corpus_path))
    m = build_index(
        spark, docs, cat, "v1", include_all_langs=True,
        keyword_fields=("lang",), numeric_fields=("page_bytes",),
    )
    assert m["numeric_fields"] == ["page_bytes"]
    return cat


def _docmap_pdf(spark, cat):
    return spark.read.parquet(cat.table_path("v1", "docmap")).toPandas()


def _expected(pdf, k, ascending=False, pred=None):
    """Pandas twin: nulls last, ties doc_id asc."""
    if pred is not None:
        pdf = pdf[pred(pdf)]
    nn = pdf[pdf["page_bytes"].notna()].sort_values(
        ["page_bytes", "doc_id"], ascending=[ascending, True]
    )
    out = list(zip(nn["doc_id"].astype(int), nn["page_bytes"]))[:k]
    if len(out) < k:
        nulls = pdf[pdf["page_bytes"].isna()].sort_values("doc_id")
        out += [(int(d), None) for d in nulls["doc_id"]][: k - len(out)]
    return out


def _rows(df):
    return [
        (int(r.doc_id),
         float(r.page_bytes) if r.page_bytes is not None else None)
        for r in df.collect()
    ]


def test_sort_topk_matches_pandas_twin(spark, sort_index):
    idx = sort_index.index_dir("v1")
    pdf = _docmap_pdf(spark, sort_index)
    for asc in (False, True):
        got = _rows(sort_topk(spark, idx, "page_bytes", 10, ascending=asc))
        assert got == _expected(pdf, 10, ascending=asc), f"asc={asc}"


def test_sort_topk_nulls_last(spark, sort_index):
    """A k beyond the non-null count reaches the ES missing:_last tail:
    null-valued docs in doc_id order."""
    idx = sort_index.index_dir("v1")
    pdf = _docmap_pdf(spark, sort_index)
    n_nonnull = int(pdf["page_bytes"].notna().sum())
    assert n_nonnull < len(pdf), "fixture must produce a null stripe"
    k = len(pdf)
    got = _rows(sort_topk(spark, idx, "page_bytes", k))
    assert got == _expected(pdf, k)
    assert any(v is None for _d, v in got)


def test_sort_topk_filters(spark, sort_index):
    idx = sort_index.index_dir("v1")
    pdf = _docmap_pdf(spark, sort_index)
    got = _rows(sort_topk(
        spark, idx, "page_bytes", 10,
        filter_term={"lang": ["en", "de"]},
        filter_range={"page_bytes": (400.0, 2000.0)},
    ))
    assert got == _expected(
        pdf, 10,
        pred=lambda p: p["lang"].isin(["en", "de"])
        & (p["page_bytes"] >= 400.0) & (p["page_bytes"] <= 2000.0),
    )
    assert got, "filters must keep some rows at this corpus size"


def test_serve_sort_parity(spark, sort_index):
    """LocalSearcher.search_sort row-identical to the Spark path on every
    shape: desc, asc, filtered, and into the null tail."""
    idx = sort_index.index_dir("v1")
    ls = LocalSearcher(idx)
    shapes = [
        dict(ascending=False),
        dict(ascending=True),
        dict(ascending=False, filter_term={"lang": "en"},
             filter_range={"page_bytes": (300.0, None)}),
    ]
    for kw in shapes:
        spark_rows = _rows(sort_topk(spark, idx, "page_bytes", 15, **kw))
        serve_rows = [
            (d, float(v) if v is not None else None)
            for d, v in ls.search_sort("page_bytes", 15, **kw)
        ]
        assert serve_rows == spark_rows, kw
    n = spark.read.parquet(
        sort_index.table_path("v1", "docmap")
    ).count()
    assert [
        (d, float(v) if v is not None else None)
        for d, v in ls.search_sort("page_bytes", n)
    ] == _rows(sort_topk(spark, idx, "page_bytes", n))


def test_bool_numeric_filter_range_restricts_never_rescores(
    spark, sort_index
):
    """filter_range over a declared NUMERIC field (the ES numeric-range
    query on total_score/pp-style doc values): results are the
    unrestricted results minus out-of-range docs, scores untouched."""
    idx = sort_index.index_dir("v1")
    base = {
        r.doc_id: r.score
        for r in bool_topk(
            spark, idx, [(0, {"must": "the"})], k=10**6
        ).collect()
        if r.score > 0.0
    }
    pdf = _docmap_pdf(spark, sort_index)
    in_range = set(
        pdf[(pdf["page_bytes"] >= 500.0) & (pdf["page_bytes"] <= 1500.0)][
            "doc_id"
        ].astype(int)
    )
    spec = {
        "must": "the",
        "filter_range": {"page_bytes": (500.0, 1500.0)},
        # msm-free spec with a must clause: positive hits only restrict
    }
    got = {
        r.doc_id: r.score
        for r in bool_topk(spark, idx, [(0, spec)], k=10**6).collect()
        if r.score > 0.0
    }
    assert set(got) == set(base) & in_range
    assert all(abs(got[d] - base[d]) < 1e-12 for d in got)


def test_sort_validation(spark, sort_index):
    idx = sort_index.index_dir("v1")
    assert sortable_fields(idx) == ("lang", "page_bytes", "url", "warc_ts")
    with pytest.raises(ValueError, match="not a stored docmap field"):
        sort_topk(spark, idx, "nope", 5)
    with pytest.raises(ValueError, match="filter_range field"):
        sort_topk(
            spark, idx, "page_bytes", 5, filter_range={"nope": (1, 2)}
        )
    with pytest.raises(ValueError, match="filter_term field"):
        sort_topk(spark, idx, "page_bytes", 5, filter_term={"nope": "x"})
    ls = LocalSearcher(idx)
    with pytest.raises(ValueError, match="not a stored docmap field"):
        ls.search_sort("nope", 5)


def test_sort_multigeneration_and_tombstones(
    spark, corpus_path, tmp_path_factory
):
    """Numeric columns ride every generation's docmap: an incrementally
    added doc is sortable; a deleted doc leaves the ranking."""
    from osu_elastic_indexer_spark.sources.fixtures import evolve_corpus
    from osu_elastic_indexer_spark.streaming.incremental import (
        incremental_update,
    )

    root = str(tmp_path_factory.mktemp("sort_gen"))
    cat = Catalog(root)
    tbl = pq.read_table(corpus_path)
    p0 = os.path.join(root, "c0.parquet")
    pq.write_table(tbl, p0)
    build_index(
        spark, _with_numeric(spark.read.parquet(p0)), cat, "v1",
        include_all_langs=True, keyword_fields=("lang",),
        numeric_fields=("page_bytes",),
    )
    idx = cat.index_dir("v1")
    pre = _rows(sort_topk(spark, idx, "page_bytes", 10))
    assert pre

    tbl2 = evolve_corpus(tbl, n_new=60, n_update=10, n_flip=6)
    p1 = os.path.join(root, "c1.parquet")
    pq.write_table(tbl2, p1)
    m = incremental_update(
        spark, _with_numeric(spark.read.parquet(p1)), cat, "v1"
    )
    assert m["generations"] == 2
    pdf = _docmap_pdf(spark, cat)
    tomb = spark.read.parquet(cat.table_path("v1", "tombstones"))
    dead = {int(r.doc_id) for r in tomb.collect()}
    pdf = pdf[~pdf["doc_id"].isin(dead)]
    got = _rows(sort_topk(spark, idx, "page_bytes", 10))
    assert got == _expected(pdf, 10)
    ls = LocalSearcher(idx)
    assert [
        (d, float(v) if v is not None else None)
        for d, v in ls.search_sort("page_bytes", 10)
    ] == got

    # tombstone the current leader; it must leave both tiers' rankings
    victim = got[0][0]
    url_v = (
        spark.read.parquet(cat.table_path("v1", "docmap"))
        .filter(F.col("doc_id") == victim).collect()[0].url
    )
    qurls = spark.createDataFrame([(url_v,)], "url string")
    docs2 = _with_numeric(
        spark.read.parquet(p1).filter(F.col("url") != url_v)
    )
    m2 = incremental_update(spark, docs2, cat, "v1", queue_urls=qurls)
    assert m2["counters"]["deletes_total"] >= 1
    post = _rows(sort_topk(spark, idx, "page_bytes", 10))
    assert victim not in [d for d, _v in post] and post
    ls2 = LocalSearcher(idx)
    assert [
        (d, float(v) if v is not None else None)
        for d, v in ls2.search_sort("page_bytes", 10)
    ] == post


def test_sort_plan_pushes_filters_no_global_sort(spark, sort_index):
    """The physical plan must show (a) the term/range predicates PUSHED
    into the parquet scan and (b) TakeOrderedAndProject — per-partition
    top-k + driver heap merge — never a global Sort+Exchange of the
    matching set."""
    idx = sort_index.index_dir("v1")
    df = sort_topk(
        spark, idx, "page_bytes", 10,
        filter_term={"lang": "en"},
        filter_range={"page_bytes": (300.0, None)},
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    scan = df._jdf.queryExecution().sparkPlan().toString()
    assert "PushedFilters" in scan
    pushed = [ln for ln in scan.splitlines() if "PushedFilters" in ln]
    joined = " ".join(pushed)
    assert "lang" in joined and "page_bytes" in joined


def test_search_after_pagination(spark, sort_index):
    """ES search_after deep paging: paging with the previous page's last
    (value, doc_id) key reconstructs the full ranking exactly — including
    across the value-tie boundaries and INTO the null tail — on both the
    Spark and serve tiers, desc and asc."""
    idx = sort_index.index_dir("v1")
    ls = LocalSearcher(idx)
    n = spark.read.parquet(sort_index.table_path("v1", "docmap")).count()
    for asc in (False, True):
        full = _rows(sort_topk(spark, idx, "page_bytes", n, ascending=asc))
        pages, after = [], None
        while True:
            page = _rows(sort_topk(
                spark, idx, "page_bytes", 7, ascending=asc, after=after
            ))
            if not page:
                break
            pages.extend(page)
            after = (page[-1][1], page[-1][0])  # (sort value, doc_id)
        assert pages == full, f"asc={asc}"
        spages, after = [], None
        while True:
            page = [
                (d, float(v) if v is not None else None)
                for d, v in ls.search_sort(
                    "page_bytes", 7, ascending=asc, after=after
                )
            ]
            if not page:
                break
            spages.extend(page)
            after = (page[-1][1], page[-1][0])
        assert spages == full, f"serve asc={asc}"


def test_search_after_with_filters(spark, sort_index):
    idx = sort_index.index_dir("v1")
    kw = dict(filter_term={"lang": ["en", "de"]})
    first = _rows(sort_topk(spark, idx, "page_bytes", 5, **kw))
    cursor = (first[-1][1], first[-1][0])
    second = _rows(sort_topk(
        spark, idx, "page_bytes", 5, after=cursor, **kw
    ))
    both = _rows(sort_topk(spark, idx, "page_bytes", 10, **kw))
    assert first + second == both
    ls = LocalSearcher(idx)
    s2 = [
        (d, float(v) if v is not None else None)
        for d, v in ls.search_sort("page_bytes", 5, after=cursor, **kw)
    ]
    assert s2 == second


def test_serve_sort_column_cached(spark, sort_index):
    """The serve tier's doc-value column loads ONCE per (field, commit):
    the second identical query reuses the cached arrays (identity), and
    the cache honors the byte budget discipline (entry present in the
    docfilter LRU)."""
    from osu_elastic_indexer_spark.operators import state
    from osu_elastic_indexer_spark.operators.wand import manifest_commit_seq
    from osu_elastic_indexer_spark.sources.catalog import committed_gen_paths

    idx = sort_index.index_dir("v1")
    paths = tuple(committed_gen_paths(idx, "docmap"))
    seq = manifest_commit_seq(idx)
    a = state.load_sort_column(paths, seq, "page_bytes")
    b = state.load_sort_column(paths, seq, "page_bytes")
    assert a[0] is b[0] and a[1] is b[1]  # cache hit, no reload
    key_present = any(
        k[1] == "page_bytes" and k[2] == ("sortcol",)
        for k in state._FILTER_CACHE
    )
    assert key_present
    # a stale commit_seq forces a reload (new committed snapshot)
    c = state.load_sort_column(paths, seq + 1, "page_bytes")
    assert c[0] is not a[0]


def test_terms_agg_matches_pandas_twin(spark, sort_index):
    """ES terms aggregation: buckets by doc count (count desc, value asc),
    nulls skipped, filter context honored — vs a pandas twin; serve tier
    row-identical."""
    from osu_elastic_indexer_spark.operators.aggquery import terms_agg

    idx = sort_index.index_dir("v1")
    pdf = _docmap_pdf(spark, sort_index)
    vc = pdf["lang"].value_counts()
    expected = sorted(
        ((v, int(c)) for v, c in vc.items()), key=lambda t: (-t[1], t[0])
    )[:10]
    got = [
        (r.lang, int(r.doc_count))
        for r in terms_agg(spark, idx, "lang", 10).collect()
    ]
    assert got == expected
    ls = LocalSearcher(idx)
    assert [(v, c) for v, c in ls.agg_terms("lang", 10)] == expected
    # filter context restricts the bucket universe
    sub = pdf[(pdf["page_bytes"] >= 500.0) & (pdf["page_bytes"] <= 1500.0)]
    vc2 = sub["lang"].value_counts()
    exp2 = sorted(
        ((v, int(c)) for v, c in vc2.items()), key=lambda t: (-t[1], t[0])
    )[:10]
    fkw = dict(filter_range={"page_bytes": (500.0, 1500.0)})
    got2 = [
        (r.lang, int(r.doc_count))
        for r in terms_agg(spark, idx, "lang", 10, **fkw).collect()
    ]
    assert got2 == exp2
    assert [(v, c) for v, c in ls.agg_terms("lang", 10, **fkw)] == exp2
    with pytest.raises(ValueError, match="terms_agg field"):
        terms_agg(spark, idx, "nope", 10)


def test_stats_agg_matches_pandas_twin(spark, sort_index):
    """ES stats aggregation (cnt/min/max/avg/sum) over the numeric
    doc-value field, nulls ignored, filter context honored; serve tier
    agrees to float tolerance."""
    from osu_elastic_indexer_spark.operators.aggquery import stats_agg

    idx = sort_index.index_dir("v1")
    pdf = _docmap_pdf(spark, sort_index)
    sub = pdf[pdf["lang"] == "en"]["page_bytes"].dropna()
    r = stats_agg(
        spark, idx, "page_bytes", filter_term={"lang": "en"}
    ).collect()[0]
    assert (r.cnt, r.min_v, r.max_v, r.sum_v) == (
        len(sub), float(sub.min()), float(sub.max()), float(sub.sum())
    )
    assert abs(r.avg_v - float(sub.mean())) < 1e-9
    ls = LocalSearcher(idx)
    sv = ls.agg_stats("page_bytes", filter_term={"lang": "en"})
    assert (sv["cnt"], sv["min_v"], sv["max_v"]) == (
        r.cnt, r.min_v, r.max_v
    )
    assert abs(sv["avg_v"] - r.avg_v) < 1e-9
    assert abs(sv["sum_v"] - r.sum_v) < 1e-6
    with pytest.raises(ValueError, match="stats_agg field"):
        stats_agg(spark, idx, "lang")  # keyword, not numeric
    # empty match -> cnt 0, None stats (both tiers)
    empty = ls.agg_stats("page_bytes", filter_term={"lang": "xx"})
    assert empty == {"cnt": 0, "min_v": None, "max_v": None,
                     "avg_v": None, "sum_v": None}
    er = stats_agg(
        spark, idx, "page_bytes", filter_term={"lang": "xx"}
    ).collect()[0]
    assert er.cnt == 0 and er.min_v is None and er.sum_v is None


def test_bool_filter_exists(spark, sort_index):
    """ES `exists` query (filter context): restricts to docs whose stored
    field is non-null — the nullable-pp restriction. Results equal the
    unrestricted hits minus null-valued docs, scores untouched; per-query,
    docpart, and serve tiers agree; unknown fields refused."""
    from osu_elastic_indexer_spark.operators.boolquery import (
        bool_topk_docpart,
    )

    idx = sort_index.index_dir("v1")
    pdf = _docmap_pdf(spark, sort_index)
    has_val = set(pdf[pdf["page_bytes"].notna()]["doc_id"].astype(int))
    assert len(has_val) < len(pdf)
    base = {
        r.doc_id: r.score
        for r in bool_topk(
            spark, idx, [(0, {"must": "the"})], k=10**6
        ).collect()
        if r.score > 0.0
    }
    spec = {"must": "the", "filter_exists": ["page_bytes"]}
    got = {
        r.doc_id: r.score
        for r in bool_topk(spark, idx, [(0, spec)], k=10**6).collect()
        if r.score > 0.0
    }
    assert set(got) == set(base) & has_val and got
    assert all(abs(got[d] - base[d]) < 1e-12 for d in got)
    dp = {
        r.doc_id: r.score
        for r in bool_topk_docpart(
            spark, idx, [(0, spec)], k=10**6
        ).collect()
        if r.score > 0.0
    }
    assert dp == got
    sv = {
        d: s for d, s in LocalSearcher(idx).search_bool(spec, 10**6)
        if s > 0.0
    }
    assert sv == got
    with pytest.raises(ValueError, match="filter_exists field"):
        bool_topk(
            spark, idx,
            [(0, {"must": "the", "filter_exists": ["nope"]})], 5,
        ).collect()
