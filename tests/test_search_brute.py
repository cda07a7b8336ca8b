"""M1 end-to-end golden test (SURVEY.md §5.2 tier 3): Spark brute-force BM25
vs pure-python oracle, rank-identical over the full reference query set."""

import pyarrow.parquet as pq
import pytest

from osu_elastic_indexer_spark import oracle
from osu_elastic_indexer_spark.functions.textprep import extract_text
from osu_elastic_indexer_spark.operators import search as S
from osu_elastic_indexer_spark.operators.docmap import assign_doc_ids
from osu_elastic_indexer_spark.operators.routing import split_batch
from osu_elastic_indexer_spark.sources.fixtures import reference_queries

from util import assert_rank_identical


@pytest.fixture(scope="module")
def built(spark, corpus_path):
    """Spark pipeline: read corpus -> route -> extract(html)->text -> doc ids
    -> tf table. Returns (tf_df, oracle_index, url_by_doc_id)."""
    from osu_elastic_indexer_spark.functions.textprep import make_extract_text_udf

    raw = spark.read.parquet(corpus_path)
    extract = make_extract_text_udf()
    docs = raw.withColumn("text", extract("html"))  # engine extracts from html
    adds, _dels = split_batch(docs)
    with_ids = assign_doc_ids(adds.select("url", "text"), num_partitions=7)
    tf = S.tf_table(with_ids).persist()
    tf.count()

    # oracle over the same docs with the same id mapping (dense rank by url)
    tbl = pq.read_table(corpus_path)
    rows = [
        (u, extract_text(h))
        for u, h, lang, txt in zip(
            tbl["url"].to_pylist(),
            tbl["html"].to_pylist(),
            tbl["lang"].to_pylist(),
            tbl["text"].to_pylist(),
        )
        if lang == "en" and txt
    ]
    rows.sort(key=lambda r: r[0])
    oidx = oracle.build_index([(i, t) for i, (u, t) in enumerate(rows)])
    return tf, oidx, [u for u, _ in rows]


def test_doc_ids_are_dense_rank_of_url(spark, built):
    tf, oidx, urls = built
    n = tf.select("doc_id").distinct().count()
    assert n == oidx.n_docs == len(urls)
    ids = sorted(r.doc_id for r in tf.select("doc_id").distinct().collect())
    assert ids == list(range(len(urls)))


def test_collection_stats_match_oracle(built):
    tf, oidx, _ = built
    row = S.collection_stats(tf).collect()[0]
    assert row.n_docs == oidx.n_docs
    assert abs(row.avgdl - oidx.avgdl) < 1e-12


def test_brute_force_rank_identical_all_queries(built):
    tf, oidx, _ = built
    for qid, qtext, k in reference_queries():
        got = [
            (r.doc_id, r.score) for r in S.bm25_topk_brute(tf, qtext, k).collect()
        ]
        expect = oracle.search(oidx, qtext, k)
        assert_rank_identical(got, expect, msg=f"q{qid} {qtext!r}")


def test_non_english_docs_absent(built):
    """Routing parity: only should_index docs are in the index (P1/U1)."""
    tf, oidx, urls = built
    assert tf.select("doc_id").distinct().count() == len(urls)


def test_tf_values_match_oracle(built):
    tf, oidx, urls = built
    term = "zebra"
    got = {r.doc_id: r.tf for r in tf.filter(tf.term == term).collect()}
    expect = oidx.postings.get(term, {})
    assert got == expect
