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
    deltas: additions contribute their own forward rows; deletions
    contribute the forward rows of the tombstoned docIDs — a PRUNED scan of
    the doc_id-clustered fwd table. This is what keeps incremental results
    rank-identical to a from-scratch rebuild — Lucene by contrast lets df
    drift until merge; our oracle defines truth over live docs, so drift
    would fail the golden tests.
  * compaction (``compact_index``) rewrites segments from live forward rows
    only, clearing tombstones — the segment-merge analog.

Write-ordering discipline: collect every scalar BEFORE the first table
write, then write in dependency order (Spark refreshes — i.e. invalidates —
all cached plans reading a path the moment that path is written; an
aggregate evaluated after an append would silently re-read appended files).
Self-appends (tombstones) are staged through a temp dir.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.build import (
    FWD_SCHEMA,
    GROUP_BATCH_ROWS,
    _fused_forward_pass,
    _ids_only_pass,
    arrow_batch_rows,
    build_segments_spimi,
    exploded_postings,
)
from ..operators.docmap import assign_dense_ids, input_order_offsets
from ..operators.routing import with_should_index
from ..sources.catalog import Catalog


def _paths(cat: Catalog, schema: str) -> dict[str, str]:
    return {t: cat.table_path(schema, t) for t in (
        "docmap", "dictionary", "segments", "stats", "tombstones", "fwd"
    )}


def incremental_update(
    spark: SparkSession,
    docs: DataFrame,
    catalog: Catalog,
    schema_version: str,
    *,
    queue_urls: DataFrame | None = None,
    salt_group_cap: int | None = None,
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
        from ..operators.routing import dedup_last_write_wins

        # J3 within-batch dedup: a url re-queued twice in one batch keeps
        # only its newest revision (ToDictionary re-key + LWW, T11)
        batch = dedup_last_write_wins(
            queue_urls.select("url").distinct().join(docs, "url", "left")
        )
    else:
        cursor = m["cursor"]
        batch = docs.filter(F.col("warc_ts") > F.lit(cursor).cast("timestamp"))
    batch = with_should_index(batch).persist()

    adds = batch.filter(F.col("should_index")).select("url", "warc_ts", "html")

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
    part, offsets_bc = input_order_offsets(
        adds.select("url", "warc_ts", "html"), start_id=start_id
    )
    fwd_new = part.select("html", "__pid").mapInArrow(
        _fused_forward_pass(offsets_bc), FWD_SCHEMA
    ).persist()
    dm_new = part.select("url", "warc_ts", "__pid").mapInPandas(
        _ids_only_pass(offsets_bc),
        "url string, warc_ts timestamp, doc_id bigint",
    ).persist()
    n_add = dm_new.count()

    if n_add == 0 and n_del == 0:
        # still advance the cursor past a batch of purely non-indexable rows
        # — otherwise every subsequent cursor batch re-scans them forever
        if queue_urls is None:
            seen_cursor = batch.agg(F.max("warc_ts")).collect()[0][0]
            if seen_cursor is not None and (
                m["cursor"] is None or str(seen_cursor) > m["cursor"]
            ):
                m["cursor"] = str(seen_cursor)
                cat.write_manifest(schema_version, m)
        for df_ in (batch, new_tombs, fwd_new, dm_new):
            df_.unpersist()
        return cat.read_manifest(schema_version)

    # ---- stats deltas (exact; see module doc) ------------------------------
    fwd_old = spark.read.parquet(p["fwd"])
    st = spark.read.parquet(p["stats"]).collect()[0]

    add_stats = fwd_new.agg(
        F.count("*").alias("n"),
        F.coalesce(F.sum("dl"), F.lit(0)).alias("sum_dl"),
        F.min("dl").alias("dl_min"),
        F.coalesce(F.sum(F.size("terms")), F.lit(0)).alias("postings"),
    ).collect()[0]
    # deleted docs' forward rows: pruned lookup in the doc-clustered fwd
    fwd_dead = fwd_old.join(F.broadcast(new_tombs), "doc_id", "left_semi")
    del_stats = fwd_dead.agg(
        F.count("*").alias("n"),
        F.coalesce(F.sum("dl"), F.lit(0)).alias("sum_dl"),
        F.coalesce(F.sum(F.size("terms")), F.lit(0)).alias("postings"),
    ).collect()[0]
    n_docs2 = int(st.n_docs) + int(add_stats.n) - int(del_stats.n)
    sum_dl2 = int(st.sum_dl) + int(add_stats.sum_dl) - int(del_stats.sum_dl)
    dl_min2 = int(st.dl_min)
    if add_stats.dl_min is not None:
        dl_min2 = min(dl_min2, int(add_stats.dl_min))
    total_postings2 = (
        int(st.total_postings) + int(add_stats.postings) - int(del_stats.postings)
    )

    # ---- dictionary deltas --------------------------------------------------
    dictionary = spark.read.parquet(p["dictionary"])
    add_df = exploded_postings(fwd_new).groupBy("term").agg(
        F.count("*").alias("adds")
    )
    del_df = exploded_postings(fwd_dead).groupBy("term").agg(
        F.count("*").alias("dels")
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
    new_cursor = batch.agg(F.max("warc_ts")).collect()[0][0]

    # ---- writes, ordered so nothing reads an already-modified path ---------
    # 1) tombstones: new_tombs reads docmap AND old tombstones -> stage to a
    #    temp dir first, then append the staged copy (self-append is unsafe)
    if n_del:
        tomb_tmp = p["tombstones"] + "_staged"
        new_tombs.write.mode("overwrite").parquet(tomb_tmp)
        spark.read.parquet(tomb_tmp).write.mode("append").parquet(p["tombstones"])
    # 2) stage the new forward rows: the segment merge loads the NEW docs'
    #    norms (doc_id, dl) executor-side from this path (they are not in
    #    the fwd table yet), and the fwd append below reuses the staged copy
    fwd_tmp = p["fwd"] + "_staged"
    fwd_new.write.mode("overwrite").parquet(fwd_tmp)
    # 3) new-generation segments (reads old dictionary via dict2 -> must
    #    precede the dictionary swap)
    if int(add_stats.postings) > 0:
        id_span = start_id + n_add
        cap = salt_group_cap or max(50_000, max(n_add, 1) // 8)
        segs, _d, sub = build_segments_spimi(
            spark, fwd_new, id_span, cap, fwd_tmp, gen,
            generation=gen, dictionary=dict2, n_terms=int(n_terms2),
        )
        with arrow_batch_rows(spark, GROUP_BATCH_ROWS):
            segs.write.mode("append").parquet(p["segments"])
        sub.unpersist()
    # 4) dictionary swap (dict2 reads the old dictionary: stage then copy)
    dict2.write.mode("overwrite").parquet(p["dictionary"] + "_next")
    spark.read.parquet(p["dictionary"] + "_next").write.mode("overwrite").parquet(
        p["dictionary"]
    )
    # 5) forward-table appends (docmap from the input batch; fwd from stage)
    dm_new.write.mode("append").parquet(p["docmap"])
    spark.read.parquet(fwd_tmp).write.mode("append").parquet(p["fwd"])
    # 6) stats (pure literal)
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
    for df_ in (batch, new_tombs, fwd_new, dm_new, merged, dict2):
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
    salt_group_cap: int | None = None,
) -> dict:
    """Segment-merge analog: rewrite segments from live forward rows only,
    clear tombstones, drop dead rows from fwd/docmap. Query results are
    unchanged (stats were already exact)."""
    cat = catalog
    cat.assert_writable(schema_version)
    p = _paths(cat, schema_version)
    tombs = (
        spark.read.parquet(p["tombstones"])
        if _exists(p["tombstones"])
        else spark.createDataFrame([], "doc_id bigint")
    )
    fwd = spark.read.parquet(p["fwd"]).join(tombs, "doc_id", "left_anti")
    dictionary = spark.read.parquet(p["dictionary"]).filter(F.col("df") > 0)
    docmap = spark.read.parquet(p["docmap"]).join(tombs, "doc_id", "left_anti")
    id_span = int(docmap.agg(F.max("doc_id")).collect()[0][0]) + 1
    cap = salt_group_cap or max(50_000, id_span // 64)
    # norms from the PRE-compaction fwd table (includes dead docs — harmless,
    # their entries are simply never indexed by live postings)
    m0 = cat.read_manifest(schema_version) or {}
    segs, _d, _sub = build_segments_spimi(
        spark, fwd, id_span, cap, p["fwd"], int(m0.get("commit_seq", 0)),
        generation=0, dictionary=dictionary,
    )
    for name, df_ in (
        ("segments", segs),
        ("fwd", fwd),
        ("docmap", docmap),
        ("dictionary", dictionary),
    ):
        with arrow_batch_rows(spark, GROUP_BATCH_ROWS):
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
