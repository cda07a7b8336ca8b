"""Incremental index maintenance: the reference's CDC loop, Spark-native.

Reference semantics being reproduced (SURVEY.md §2.8):
  T1   micro-batch: one call == one queue batch (IndexQueueProcessor.cs:26)
  T7   at-least-once + idempotence: re-running a batch is harmless — updates
       tombstone the old docID and append a fresh one keyed by url, deletes
       of already-dead docs are no-ops (Score.cs:17 doc-keyed upserts)
  T8   resume cursor: batches are selected by warc_ts > manifest.cursor —
       the keyset-cursor loop of ElasticModel.cs:44-54 / PumpAllScores
       --from; alternatively an explicit url list (the Redis queue analog,
       ScoreQueueItem.cs)
  T9   two-phase cutover: full build at a snapshot, then a catch-up
       incremental pass for rows that arrived mid-build, then alias swap
       (PumpAllScoresCommand.cs:57-65 --switch)
  routing: changed rows that pass ShouldIndex -> add (tombstone the previous
       docID if the url was already indexed); rows that fail it, or queued
       urls missing from the source -> delete (IndexQueueProcessor.cs:41-60,
       ElasticModel.cs:63-65)

Design decisions for exactness at scale:
  * updates never rewrite old segments: the old docID is tombstoned and the
    new revision gets a fresh docID > all existing — docID ranges stay
    disjoint per generation, so a term's segment rows still concatenate into
    a sorted global posting list (operators/wand.py reads them as one).
  * collection statistics (N, sum_dl, per-term df) are maintained EXACTLY by
    deltas: additions contribute their own tf rows; deletions contribute the
    tf rows of the tombstoned docIDs, which are a PRUNED scan of the tf
    forward table (clustered by doc_id at build time). This is what keeps
    incremental results rank-identical to a from-scratch rebuild — Lucene by
    contrast lets df drift until merge; our oracle defines truth over live
    docs, so drift would fail the golden tests.
  * compaction (``compact_index``) rewrites segments from live tf rows only,
    clearing tombstones — the segment-merge analog.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.textprep import make_extract_text_udf
from ..operators.build import encode_segments
from ..operators.docmap import assign_dense_ids
from ..operators.routing import with_should_index
from ..operators.search import tf_table
from ..sources.catalog import Catalog


def _paths(cat: Catalog, schema: str) -> dict[str, str]:
    return {t: cat.table_path(schema, t) for t in (
        "docmap", "dictionary", "segments", "stats", "tombstones", "tf", "doclens"
    )}


def incremental_update(
    spark: SparkSession,
    docs: DataFrame,
    catalog: Catalog,
    schema_version: str,
    *,
    queue_urls: DataFrame | None = None,
    salt_group_cap: int = 1_000_000,
) -> dict:
    """Apply one incremental batch to an existing index.

    ``docs``: the current state of the source table (url, warc_ts, html,
    text, lang). The batch is rows with warc_ts > manifest.cursor, or — if
    ``queue_urls`` (a 1-column 'url' DataFrame) is given — exactly those
    urls, resolved against the source (missing -> delete), mirroring the
    queue-consume path. Returns the updated manifest.
    """
    from ..session import ship_package

    ship_package(spark)
    cat = catalog
    cat.assert_writable(schema_version)
    m = cat.read_manifest(schema_version)
    assert m is not None and m["phases"].get("commit"), "no base index to update"
    p = _paths(cat, schema_version)
    gen = int(m["generations"])

    # ---- select the batch (T8 cursor or explicit queue) -------------------
    if queue_urls is not None:
        batch = queue_urls.select("url").distinct().join(docs, "url", "left")
    else:
        cursor = m["cursor"]
        batch = docs.filter(F.col("warc_ts") > F.lit(cursor).cast("timestamp"))
    batch = with_should_index(batch).persist()

    adds = batch.filter(F.col("should_index")).select("url", "warc_ts", "html")
    dels = batch.filter(~F.col("should_index")).select("url")

    docmap = spark.read.parquet(p["docmap"])
    old_tombs = (
        spark.read.parquet(p["tombstones"])
        if _exists(p["tombstones"])
        else spark.createDataFrame([], "doc_id bigint")
    )
    live = docmap.join(old_tombs, "doc_id", "left_anti")

    # every changed url that is currently live gets its old docID tombstoned
    # (update -> delete+add with fresh id; delete -> tombstone only)
    changed_urls = batch.select("url").distinct()
    new_tombs = live.join(changed_urls, "url", "left_semi").select("doc_id")
    new_tombs = new_tombs.persist()
    n_del = new_tombs.count()

    # ---- fresh docIDs for additions (ids extend the space: start=max+1) ---
    max_doc = docmap.agg(F.max("doc_id")).collect()[0][0]
    start_id = int(max_doc) + 1 if max_doc is not None else 0
    extract = make_extract_text_udf()
    add_docs = adds.withColumn("text", extract("html")).select(
        "url", "warc_ts", "text"
    )
    with_ids = assign_dense_ids(add_docs, ["url"], "doc_id", start_id=start_id)
    with_ids = with_ids.persist()
    n_add = with_ids.count()

    if n_add == 0 and n_del == 0:
        batch.unpersist(); new_tombs.unpersist(); with_ids.unpersist()
        return m

    # ---- stats deltas (exact; see module doc) ------------------------------
    tf_old = spark.read.parquet(p["tf"])
    doclens_old = spark.read.parquet(p["doclens"])
    st = spark.read.parquet(p["stats"]).collect()[0]

    tf_new = tf_table(with_ids.select("doc_id", "text")).persist()
    dl_new = tf_new.groupBy("doc_id").agg(F.max("dl").alias("dl"))
    add_stats = dl_new.agg(
        F.count("*").alias("n"), F.coalesce(F.sum("dl"), F.lit(0)).alias("sum_dl"),
        F.min("dl").alias("dl_min"),
    ).collect()[0]
    # deleted docs' lengths: pruned lookup in doclens
    del_stats = (
        doclens_old.join(F.broadcast(new_tombs), "doc_id", "left_semi")
        .agg(F.count("*").alias("n"), F.coalesce(F.sum("dl"), F.lit(0)).alias("sum_dl"))
        .collect()[0]
    )
    n_docs2 = int(st.n_docs) + int(add_stats.n) - int(del_stats.n)
    sum_dl2 = int(st.sum_dl) + int(add_stats.sum_dl) - int(del_stats.sum_dl)
    dl_min2 = int(st.dl_min)
    if add_stats.dl_min is not None:
        dl_min2 = min(dl_min2, int(add_stats.dl_min))

    # ---- dictionary deltas --------------------------------------------------
    dictionary = spark.read.parquet(p["dictionary"])
    add_df = tf_new.groupBy("term").agg(F.count("*").alias("adds"))
    # terms of deleted docs: pruned scan of the clustered tf forward table
    del_df = (
        tf_old.join(F.broadcast(new_tombs), "doc_id", "left_semi")
        .groupBy("term")
        .agg(F.count("*").alias("dels"))
    )
    merged = (
        dictionary.join(add_df, "term", "full")
        .join(del_df, "term", "full")
        .select(
            "term",
            "term_id",
            (
                F.coalesce(F.col("df"), F.lit(0))
                + F.coalesce(F.col("adds"), F.lit(0))
                - F.coalesce(F.col("dels"), F.lit(0))
            ).cast("bigint").alias("df"),
        )
    ).persist()
    known = merged.filter(F.col("term_id").isNotNull())
    max_tid = dictionary.agg(F.max("term_id")).collect()[0][0]
    fresh = assign_dense_ids(
        merged.filter(F.col("term_id").isNull()).select("term", "df"),
        [F.desc("df"), F.asc("term")],
        "term_id",
        start_id=int(max_tid) + 1 if max_tid is not None else 0,
    ).select("term_id", "term", "df")
    dict2 = known.select("term_id", "term", "df").unionByName(fresh).persist()
    n_terms2 = dict2.count()

    # ---- collect ALL remaining scalars BEFORE any write --------------------
    # Spark refreshes (and thereby invalidates) every cached/derived plan
    # that reads a path the moment that path is written; an aggregate
    # evaluated after an append would silently re-read the appended files.
    total_postings_add = tf_new.count()
    del_postings = int(
        del_df.agg(F.coalesce(F.sum("dels"), F.lit(0))).collect()[0][0]
    )
    total_postings2 = int(st.total_postings) + int(total_postings_add) - del_postings
    new_cursor = batch.agg(F.max("warc_ts")).collect()[0][0]

    # ---- writes, ordered so nothing reads an already-modified path ---------
    # 1) tombstones: new_tombs reads docmap AND old tombstones -> stage to a
    #    temp dir first, then append the staged copy (self-append is unsafe)
    if n_del:
        tomb_tmp = p["tombstones"] + "_staged"
        new_tombs.write.mode("overwrite").parquet(tomb_tmp)
        spark.read.parquet(tomb_tmp).write.mode("append").parquet(p["tombstones"])
    # 2) new-generation segments (reads old dictionary via dict2 -> must
    #    precede the dictionary swap)
    if total_postings_add > 0:
        enc_tf = tf_new.join(dict2.select("term", "term_id"), "term").select(
            "term_id", "doc_id", "tf", "dl"
        )
        id_span = start_id + n_add
        segs = encode_segments(
            enc_tf, dict2, id_span,
            salt_group_cap=salt_group_cap, generation=gen,
        )
        segs.write.mode("append").parquet(p["segments"])
    # 3) dictionary swap (dict2 reads the old dictionary: stage then copy)
    dict2.write.mode("overwrite").parquet(p["dictionary"] + "_next")
    spark.read.parquet(p["dictionary"] + "_next").write.mode("overwrite").parquet(
        p["dictionary"]
    )
    # 4) forward-table appends (sources: batch/with_ids only — safe)
    with_ids.select("url", "warc_ts", "doc_id").write.mode("append").parquet(
        p["docmap"]
    )
    tf_new.write.mode("append").parquet(p["tf"])
    dl_new.write.mode("append").parquet(p["doclens"])
    # 5) stats (pure literal)
    stats2 = spark.createDataFrame(
        [(n_docs2, sum_dl2, float(sum_dl2) / n_docs2 if n_docs2 else 0.0,
          dl_min2, total_postings2)],
        "n_docs bigint, sum_dl bigint, avgdl double, dl_min bigint, "
        "total_postings bigint",
    )
    stats2.write.mode("overwrite").parquet(p["stats"] + "_next")
    spark.read.parquet(p["stats"] + "_next").write.mode("overwrite").parquet(
        p["stats"]
    )

    # ---- manifest commit ----------------------------------------------------
    m = cat.read_manifest(schema_version)
    m["generations"] = gen + 1
    if new_cursor is not None and (m["cursor"] is None or str(new_cursor) > m["cursor"]):
        m["cursor"] = str(new_cursor)
    m["counters"] = {
        "docs": n_docs2,
        "postings": total_postings2,
        "bytes": m["counters"].get("bytes"),
        "tombstones": None,
    }
    cat.write_manifest(schema_version, m)
    cat.mark_phase(
        schema_version, f"incremental_gen{gen}", "done",
        adds=int(n_add), deletes=int(n_del), terms=int(n_terms2),
    )
    for df_ in (batch, new_tombs, with_ids, tf_new, merged, dict2):
        df_.unpersist()
    return cat.read_manifest(schema_version)


def backfill_with_switch(
    spark: SparkSession,
    docs_at_start: DataFrame,
    docs_at_end: DataFrame,
    catalog: Catalog,
    schema_version: str,
    *,
    close_others: bool = True,
) -> dict:
    """T9 two-phase cutover (`pump-all --switch`): full build over the
    snapshot taken at start, then a catch-up incremental pass over rows that
    arrived during the build (warc_ts > build cursor), then the atomic alias
    swap. ``docs_at_end`` stands in for re-reading the live table after the
    backfill (tests pass a grown DataFrame; production passes the same
    table reference twice)."""
    from ..operators.build import build_index

    build_index(spark, docs_at_start, catalog, schema_version)
    m = incremental_update(spark, docs_at_end, catalog, schema_version)
    catalog.update_alias(schema_version, close_others=close_others)
    return m


def compact_index(
    spark: SparkSession,
    catalog: Catalog,
    schema_version: str,
    salt_group_cap: int = 1_000_000,
) -> dict:
    """Segment-merge analog: rewrite segments from live tf rows only, clear
    tombstones, drop dead rows from tf/doclens/docmap. Query results are
    unchanged (stats were already exact)."""
    cat = catalog
    cat.assert_writable(schema_version)
    p = _paths(cat, schema_version)
    tombs = (
        spark.read.parquet(p["tombstones"])
        if _exists(p["tombstones"])
        else spark.createDataFrame([], "doc_id bigint")
    )
    tf = spark.read.parquet(p["tf"]).join(tombs, "doc_id", "left_anti")
    dictionary = spark.read.parquet(p["dictionary"]).filter(F.col("df") > 0)
    enc_tf = tf.join(dictionary.select("term", "term_id"), "term").select(
        "term_id", "doc_id", "tf", "dl"
    )
    docmap = spark.read.parquet(p["docmap"]).join(tombs, "doc_id", "left_anti")
    id_span = int(docmap.agg(F.max("doc_id")).collect()[0][0]) + 1
    segs = encode_segments(
        enc_tf, dictionary, id_span, salt_group_cap=salt_group_cap, generation=0
    )
    for name, df_ in (
        ("segments", segs),
        ("tf", tf),
        ("docmap", docmap),
        ("doclens", spark.read.parquet(p["doclens"]).join(tombs, "doc_id", "left_anti")),
        ("dictionary", dictionary),
    ):
        df_.write.mode("overwrite").parquet(p[name] + "_next")
        spark.read.parquet(p[name] + "_next").write.mode("overwrite").parquet(p[name])
    import shutil

    if _exists(p["tombstones"]):
        shutil.rmtree(p["tombstones"])
    m = cat.read_manifest(schema_version)
    m["generations"] = 1
    cat.write_manifest(schema_version, m)
    cat.mark_phase(schema_version, "compact", "done")
    return m


def _exists(path: str) -> bool:
    import os

    return os.path.isdir(path) and any(
        f.endswith(".parquet") for f in os.listdir(path)
    )
