"""Streaming watch mode (S4/T10): file-source queue -> foreachBatch
incremental updates; schema-move self-stop."""

import pyarrow.parquet as pq
import pytest

from osu_elastic_indexer_spark import oracle
from osu_elastic_indexer_spark.functions.textprep import extract_text
from osu_elastic_indexer_spark.operators.wand import wand_topk_with_urls
from osu_elastic_indexer_spark.sources.catalog import Catalog
from osu_elastic_indexer_spark.sources.fixtures import (
    evolve_corpus,
    generate_documents,
)
from osu_elastic_indexer_spark.streaming.watch import push_batch, watch

from util import assert_rank_identical


@pytest.fixture(scope="module")
def stream_env(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("stream")
    base = generate_documents(500)
    final = evolve_corpus(base, n_new=60, n_update=15, n_flip=10)
    pq.write_table(base, str(d / "base.parquet"))
    pq.write_table(final, str(d / "final.parquet"))
    queue_dir = str(d / "queue")
    cat = Catalog(str(d / "idx"))
    return spark, queue_dir, cat, str(d / "base.parquet"), str(d / "final.parquet"), final


def test_watch_bootstrap_and_update(stream_env):
    spark, queue_dir, cat, base_p, final_p, final = stream_env
    base_df = spark.read.parquet(base_p)
    final_df = spark.read.parquet(final_p)

    # batch 1: full base corpus -> bootstrap build
    push_batch(spark, base_df, queue_dir)
    m1 = watch(spark, queue_dir, cat, "v1", available_now=True)
    assert m1["phases"]["commit"]["status"] == "done"

    # batch 2: only the changed rows (the queue producer pushes deltas)
    cursor = m1["cursor"]
    from pyspark.sql import functions as F

    delta = final_df.filter(F.col("warc_ts") > F.lit(cursor).cast("timestamp"))
    assert delta.count() > 0
    push_batch(spark, delta, queue_dir)
    m2 = watch(spark, queue_dir, cat, "v1", available_now=True)
    assert m2["generations"] == 2

    # rank-identity vs oracle over the final corpus
    rows = [
        (u, extract_text(h))
        for u, h, lang, txt in zip(
            final["url"].to_pylist(), final["html"].to_pylist(),
            final["lang"].to_pylist(), final["text"].to_pylist(),
        )
        if lang == "en" and txt
    ]
    rows.sort(key=lambda r: r[0])
    ourls = [u for u, _ in rows]
    oidx = oracle.build_index(list(enumerate(t for _, t in rows)))
    res = wand_topk_with_urls(
        spark, cat.index_dir("v1"), [(0, "recrawled updatedcontent"), (1, "zebra")], 10
    ).collect()
    by_q = {}
    for r in res:
        by_q.setdefault(r.query_id, []).append((r.rank, r.url, r.score))
    for qid, qtext in [(0, "recrawled updatedcontent"), (1, "zebra")]:
        got = [(u, s) for _rk, u, s in sorted(by_q.get(qid, []))]
        expect = [(ourls[d], s) for d, s in oracle.search(oidx, qtext, 10)]
        full = [(ourls[d], s) for d, s in oracle.search(oidx, qtext, 200)]
        assert_rank_identical(got, expect, msg=f"watch q{qid}", expect_full=full)


def test_watch_idempotent_on_empty_queue(stream_env):
    spark, queue_dir, cat, *_ = stream_env
    m_before = cat.read_manifest("v1")
    m_after = watch(spark, queue_dir, cat, "v1", available_now=True)
    assert m_after["generations"] == m_before["generations"]


def test_watch_stops_when_schema_moves(stream_env, tmp_path):
    """T10: current schema moved to another version -> watcher self-stops
    CLEANLY (the reference's checkSchema deregister, ScoreIndexer.cs:72-74),
    consumes nothing, and surfaces the reason — in availableNow mode too,
    not just --follow."""
    spark, queue_dir, cat, base_p, *_ = stream_env
    adds_before = (cat.read_manifest("v1") or {}).get("counters", {}).get(
        "adds_total"
    )
    cat.find_or_create_index("v2")
    cat.update_alias("v2")  # control channel now points elsewhere
    push_batch(spark, spark.read.parquet(base_p).limit(5), queue_dir)
    m = watch(spark, queue_dir, cat, "v1", available_now=True)
    assert "schema moved" in m.get("stop_reason", "")
    # nothing was consumed into the stale schema
    adds_after = (cat.read_manifest("v1") or {}).get("counters", {}).get(
        "adds_total"
    )
    assert adds_after == adds_before
    cat.update_alias("v1")  # restore for other tests


def test_watch_auto_compaction(spark, tmp_path):
    """compact_every: once a batch commit reaches the generation threshold,
    the watcher compacts inline (ES segment-merge analog) — generations
    fold back to 1, tombstones clear, results unchanged."""
    import os

    from pyspark.sql import functions as F

    queue_dir = str(tmp_path / "queue")
    os.makedirs(queue_dir)
    cat = Catalog(str(tmp_path / "idx"))
    base = generate_documents(400)
    final = evolve_corpus(base, n_new=50, n_update=10, n_flip=5)
    bp = str(tmp_path / "b.parquet")
    fp = str(tmp_path / "f.parquet")
    pq.write_table(base, bp)
    pq.write_table(final, fp)

    push_batch(spark, spark.read.parquet(bp), queue_dir)
    m1 = watch(spark, queue_dir, cat, "v1", available_now=True, compact_every=2)
    assert m1["generations"] == 1  # bootstrap build

    cursor = m1["cursor"]
    delta = spark.read.parquet(fp).filter(
        F.col("warc_ts") > F.lit(cursor).cast("timestamp")
    )
    push_batch(spark, delta, queue_dir)
    m2 = watch(spark, queue_dir, cat, "v1", available_now=True, compact_every=2)
    # incremental made generations 2 -> threshold hit -> compacted back to 1
    assert m2["generations"] == 1
    assert (m2.get("tables") or {}).get("segments", "").startswith("segments_v")
    from osu_elastic_indexer_spark.sources.catalog import read_metric_events

    kinds = [e["event"] for e in read_metric_events(cat.index_dir("v1"))]
    assert kinds == ["full_build", "incremental_commit", "compact"]


def test_idle_follow_watcher_stops_on_schema_move(spark, tmp_path):
    """T10 timer poll (VERDICT r2 #4): a --follow watcher on an EMPTY queue
    never enters process() (no files -> no micro-batch), so the schema check
    must run on a driver-side timer (the reference's 5 s checkSchema timer,
    ScoreIndexer.cs:39,52-80). Move the schema while the queue is empty and
    the blocked watcher must stop within ~a poll interval."""
    import os
    import threading
    import time

    queue_dir = str(tmp_path / "queue")
    os.makedirs(queue_dir)
    cat = Catalog(str(tmp_path / "idx"))
    cat.find_or_create_index("v1")
    cat.update_alias("v1")

    def move_schema():
        time.sleep(2.0)
        cat.find_or_create_index("v2")
        cat.update_alias("v2")

    mover = threading.Thread(target=move_schema)
    mover.start()
    t0 = time.monotonic()
    m = watch(
        spark, queue_dir, cat, "v1",
        available_now=False, poll_interval="1 seconds",
    )
    elapsed = time.monotonic() - t0
    mover.join()
    assert "schema moved" in m.get("stop_reason", ""), m
    assert elapsed < 30, f"watcher did not stop promptly ({elapsed:.1f}s)"


def test_interval_seconds_unit_set():
    """The pre-parse accepts exactly the fixed-duration units Spark's
    processingTime trigger parses (microsecond..week), and rejects
    ambiguous/unknown units BEFORE a stream starts (ADVICE r3)."""
    from osu_elastic_indexer_spark.streaming.watch import _interval_seconds

    assert _interval_seconds("5 seconds") == 5.0
    assert _interval_seconds("500 milliseconds") == 0.5
    assert _interval_seconds("250 microseconds") == 2.5e-4
    assert _interval_seconds("2 minutes") == 120.0
    assert _interval_seconds("1 hour") == 3600.0
    assert _interval_seconds("1 day") == 86400.0
    assert _interval_seconds("2 weeks") == 1209600.0
    import pytest as _pytest

    for bad in ("5 parsecs", "1 m", "3 months", "1 year"):
        with _pytest.raises(ValueError):
            _interval_seconds(bad)


def test_metrics_tail_zero_is_empty(tmp_path):
    """metrics-tail -n 0 must print NOTHING, not the entire history
    (out[-0:] slices from index 0 — ADVICE r3)."""
    import os

    from osu_elastic_indexer_spark.sources.catalog import (
        emit_metric_event,
        read_metric_events,
    )

    d = str(tmp_path / "idx")
    os.makedirs(d)
    for i in range(5):
        emit_metric_event(d, "e", i=i)
    assert read_metric_events(d, last=0) == []
    assert read_metric_events(d, last=-3) == []
    assert len(read_metric_events(d, last=2)) == 2
    assert len(read_metric_events(d)) == 5
