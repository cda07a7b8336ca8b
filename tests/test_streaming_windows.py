"""Event-time streaming: watermarked window aggregation (late data in, too-
late data dropped, append emits each finalized window once) and keyed-state
LWW dedup across micro-batches (applyInPandasWithState), both surviving a
checkpoint restart."""

import datetime

import pytest
from pyspark.sql import functions as F

from osu_elastic_indexer_spark.streaming.watch import push_batch
from osu_elastic_indexer_spark.streaming.windows import (
    dedup_latest_stream,
    ingest_rate_windows,
)


def _ts(minute, second=0):
    return datetime.datetime(2026, 1, 1, 10, minute, second)


def _docs(spark, rows):
    """rows: [(url, dt, text)] -> DOC_SCHEMA frame."""
    data = [
        (u, t, ("<body>" + x + "</body>").encode(), x, "en") for u, t, x in rows
    ]
    return spark.createDataFrame(
        data, "url string, warc_ts timestamp, html binary, text string, lang string"
    )


def _run_windows(spark, queue_dir, out_dir, ckpt):
    q = (
        ingest_rate_windows(spark, queue_dir, "1 minute", "2 minutes")
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .format("parquet")
        .option("path", out_dir)
        .start()
    )
    q.awaitTermination(120)
    try:
        return spark.read.parquet(out_dir)
    except Exception:
        return None  # no output files yet


def test_windowed_ingest_watermark(spark, tmp_path):
    queue = str(tmp_path / "q")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # batch 1: rows in windows [10:00,10:01) and [10:01,10:02)
    push_batch(spark, _docs(spark, [
        ("a", _ts(0, 10), "alpha"), ("b", _ts(1, 10), "beta"),
    ]), queue)
    res = _run_windows(spark, queue, out, ckpt)
    # watermark after batch 1 = 10:01:10 - 2min -> nothing finalized
    assert res is None or res.count() == 0

    # batch 2: a LATE row for w1 (within watermark) + a row advancing the
    # watermark to 10:03 -> finalizes w1 (2 docs incl. the late one) and w2
    push_batch(spark, _docs(spark, [
        ("c", _ts(0, 30), "late-but-ok"), ("d", _ts(5, 0), "advance"),
    ]), queue)
    res = _run_windows(spark, queue, out, ckpt)
    got = {
        r.w_start.minute: r.n_docs
        for r in res.filter(F.col("lang") == "en").collect()
    }
    assert got == {0: 2, 1: 1}, got

    # batch 3: a TOO-late row for w1 (watermark 10:03 > window end 10:01)
    # is dropped; w1 is never re-emitted (append contract)
    push_batch(spark, _docs(spark, [("e", _ts(0, 40), "too-late")]), queue)
    res = _run_windows(spark, queue, out, ckpt)
    w1 = res.filter(F.col("w_start") == _ts(0, 0)).collect()
    assert len(w1) == 1 and w1[0].n_docs == 2


def _run_dedup(spark, queue_dir, out_rows, ckpt):
    def sink(batch_df, _bid):
        out_rows.extend(
            (r.url, r.warc_ts) for r in batch_df.collect()
        )

    q = (
        dedup_latest_stream(spark, queue_dir)
        .writeStream.outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .foreachBatch(sink)
        .start()
    )
    q.awaitTermination(120)


def test_stateful_dedup_across_batches(spark, tmp_path):
    queue = str(tmp_path / "q")
    ckpt = str(tmp_path / "ckpt")
    got: list = []

    # batch 1: A@10:00, B@10:01 -> both emitted
    push_batch(spark, _docs(spark, [
        ("A", _ts(0), "a1"), ("B", _ts(1), "b1"),
    ]), queue)
    _run_dedup(spark, queue, got, ckpt)
    assert sorted(u for u, _ in got) == ["A", "B"]

    # batch 2 (fresh stream run, state from checkpoint): stale A suppressed,
    # newer B emitted, new C emitted; in-batch dup of C collapses to newest
    got.clear()
    push_batch(spark, _docs(spark, [
        ("A", _ts(0) - datetime.timedelta(minutes=5), "a-stale"),
        ("B", _ts(2), "b2"),
        ("C", _ts(3), "c1"), ("C", _ts(4), "c2"),
    ]), queue)
    _run_dedup(spark, queue, got, ckpt)
    emitted = dict(got)
    assert "A" not in emitted
    assert emitted["B"] == _ts(2)
    assert emitted["C"] == _ts(4)
    assert len(got) == 2
