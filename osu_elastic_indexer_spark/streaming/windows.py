"""Event-time streaming operators over the document queue: watermarked
window aggregation and custom keyed state (applyInPandasWithState).

The reference emits per-batch add/delete metrics to DogStatsd
(IndexQueueProcessor.cs:52,57) and dedups re-queued ids WITHIN a batch by
re-keying (IndexQueueProcessor.cs:46). These are the streaming-native
generalizations:

  * ingest_rate_windows — per-event-time-window ingest metrics with a
    WATERMARK: late rows within the allowed delay still land in their
    window; rows later than the watermark are dropped (counted by Spark's
    stateOperators metrics). Append mode only emits FINALIZED windows, so
    downstream consumers (dashboards, the A2 gauge) never see a window
    twice.
  * dedup_latest_stream — CROSS-batch last-write-wins dedup by url with
    explicit keyed state and a processing-time TTL, the stateful
    generalization of the reference's per-batch ToDictionary re-key. State
    is one int64 per url and idle urls are evicted on timeout, so state
    size tracks the ACTIVE url set, not the corpus (the 10^12-doc
    requirement for any keyed streaming state).

Both run on the same file-source queue as streaming/watch.py and recover
from checkpoints (tests restart the stream mid-sequence).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .watch import DOC_SCHEMA

# one int64: last applied warc_ts in epoch-microseconds
_DEDUP_STATE_SCHEMA = "last_us bigint"
_DEDUP_OUT_SCHEMA = "url string, warc_ts timestamp, lang string"


def ingest_rate_windows(
    spark: SparkSession,
    queue_dir: str,
    window: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Streaming frame of finalized ingest-rate windows:
    (w_start, w_end, lang, n_docs, n_chars).

    Attach with ``.writeStream.outputMode("append")`` — append + watermark
    emits each window exactly once, when the watermark passes its end.
    The shuffle key is (window, lang): bounded state, no skew beyond the
    lang distribution (head langs split fine — counts are commutative)."""
    stream = spark.readStream.schema(DOC_SCHEMA).parquet(queue_dir)
    return (
        stream.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), "lang")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.coalesce(F.sum(F.length("text")), F.lit(0))
            .cast("bigint")
            .alias("n_chars"),
        )
        .select(
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            "lang",
            "n_docs",
            "n_chars",
        )
    )


def _dedup_fn(key, pdfs, state):
    """Keyed state body: emit each url's newest row IF it is newer than the
    remembered last-applied timestamp; update state; arm the TTL timer.
    Runs as Arrow-batched pandas per key group — no per-row Python beyond
    the group loop the engine itself provides."""
    import pandas as pd

    if state.hasTimedOut:
        state.remove()
        return
    last_us = state.get[0] if state.exists else -1
    best = None
    for pdf in pdfs:
        if pdf.empty:
            continue
        row = pdf.loc[pdf["warc_ts"].idxmax()]
        if best is None or row["warc_ts"] > best["warc_ts"]:
            best = row
    if best is not None:
        ts_us = int(pd.Timestamp(best["warc_ts"]).value // 1000)
        if ts_us > last_us:
            state.update((ts_us,))
            yield pd.DataFrame(
                {
                    "url": [key[0]],
                    "warc_ts": [best["warc_ts"]],
                    "lang": [best["lang"]],
                }
            )
    # evict idle urls: state tracks the active set, not the corpus
    state.setTimeoutDuration(30 * 60 * 1000)


def dedup_latest_stream(spark: SparkSession, queue_dir: str) -> DataFrame:
    """Streaming LWW dedup by url with keyed state + processing-time TTL.

    Emits (url, warc_ts, lang) only when a strictly NEWER version of the
    url arrives than anything previously emitted — across micro-batches,
    which the reference's per-batch re-key cannot do. Use outputMode
    "update"."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    stream = spark.readStream.schema(DOC_SCHEMA).parquet(queue_dir)
    return (
        stream.select("url", "warc_ts", "lang")
        .groupBy("url")
        .applyInPandasWithState(
            _dedup_fn,
            outputStructType=_DEDUP_OUT_SCHEMA,
            stateStructType=_DEDUP_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
