"""Dictionary operators (J4): dense termID assignment and the thresholded
broadcast-or-shuffle tokens⋈dictionary join — results identical either way,
join strategy flipping with the threshold (the 10^8-term scale path)."""

from pyspark.sql import functions as F

from osu_elastic_indexer_spark.operators.dictionary import (
    build_dictionary,
    encode_terms,
)


def _postings(spark):
    rows = [
        # (doc_id, term, tf, dl)
        (0, "the", 3, 10), (0, "cat", 1, 10), (0, "sat", 1, 10),
        (1, "the", 2, 8), (1, "dog", 2, 8),
        (2, "the", 1, 5), (2, "cat", 1, 5),
        (3, "zebra", 4, 4),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, term string, tf bigint, dl bigint")


def test_build_dictionary_df_desc_dense_ids(spark):
    d = {r.term: (r.term_id, r.df) for r in build_dictionary(_postings(spark)).collect()}
    assert d["the"] == (0, 3)          # highest df -> smallest id
    assert d["cat"] == (1, 2)
    assert d["dog"][1] == 1 and d["sat"][1] == 1 and d["zebra"][1] == 1
    assert sorted(tid for tid, _ in d.values()) == [0, 1, 2, 3, 4]  # dense


def test_encode_terms_broadcast_vs_shuffle_identical(spark):
    tf = _postings(spark)
    dictionary = build_dictionary(tf)
    bc = encode_terms(tf, dictionary)  # tiny dict -> broadcast hint
    sh = encode_terms(tf, dictionary, broadcast_threshold=0)  # no hint
    # disable auto-broadcast so the plan reflects OUR hint only (emulates an
    # over-the-size-limit dictionary, where forcing broadcast would OOM)
    key = "spark.sql.autoBroadcastJoinThreshold"
    old = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try:
        bc_plan = bc._jdf.queryExecution().executedPlan().toString()
        sh_plan = sh._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set(key, old)
    assert "BroadcastHashJoin" in bc_plan
    assert "BroadcastHashJoin" not in sh_plan
    assert sorted(map(tuple, bc.collect())) == sorted(map(tuple, sh.collect()))
    assert bc.count() == tf.count()


def test_remote_fallback_matches_pyarrow_seek(spark, corpus_path, tmp_path):
    """ADVICE r4: on a Hadoop-FS-only index location the term lookups must
    fall back to a Spark scan (broadcast probe) and return EXACTLY what
    the driver-local pyarrow seek returns; without a session they must
    refuse with a clear error, and the serving tier's local contract is
    unchanged. The fallback is exercised directly (same code path the URI
    dispatch takes) plus via monkeypatched visibility."""
    import pytest

    from osu_elastic_indexer_spark.operators import dictionary as D
    from osu_elastic_indexer_spark.operators.build import build_index
    from osu_elastic_indexer_spark.sources.catalog import (
        Catalog,
        committed_gen_paths,
    )

    cat = Catalog(str(tmp_path / "idx"))
    build_index(spark, spark.read.parquet(corpus_path), cat, "v1")
    idx = cat.index_dir("v1")
    terms = ["the", "w00100", "w00200", "xyzzyabsent"]

    seek = D.lookup_term_info(spark, idx, terms)
    paths = committed_gen_paths(idx, "dict_by_term")
    assert D._lookup_term_info_spark(spark, paths, sorted(set(terms))) == seek
    assert seek and "xyzzyabsent" not in seek

    # URI dispatch: fake a non-visible path scheme
    assert not D._driver_visible(["hdfs://nn/idx/part.parquet"])
    assert D._driver_visible([str(tmp_path), "file:///x/y.parquet"])
    orig = D._driver_visible
    try:
        D._driver_visible = lambda _p: False
        assert D.lookup_term_info(spark, idx, terms) == seek
        with pytest.raises(RuntimeError, match="driver-visible"):
            D.lookup_term_info(None, idx, terms)
        pfx_spark = D.lookup_terms_by_prefix(idx, "w001", 50, spark=spark)
        with pytest.raises(RuntimeError, match="driver-visible"):
            D.lookup_terms_by_prefix(idx, "w001", 50)
    finally:
        D._driver_visible = orig
    assert pfx_spark == D.lookup_terms_by_prefix(idx, "w001", 50)
    assert len(pfx_spark) == 50 and all(t.startswith("w001") for t in pfx_spark)
