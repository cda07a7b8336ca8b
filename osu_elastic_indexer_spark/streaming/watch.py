"""Continuous indexing: the reference's `queue watch` as Structured Streaming.

Reference path (SURVEY.md §3.1): a long-lived consumer pops id-batches from
a Redis list, hydrates, routes add/delete, bulk-writes, and a 5s timer
watches the control channel for schema changes (WatchQueueCommand.cs,
ScoreIndexer.cs:26-80, IndexQueueProcessor.cs:39-77).

Spark-native form: a file-source stream over a drop directory of parquet
"queue" files (each file = a pushed batch of full document rows — the
payload-carrying variant of ScoreQueueItem) -> foreachBatch applies the same
incremental_update used by the batch path (idempotent upsert/delete, exact
stats), then checks the control channel (T10): if the current schema moved
to ANOTHER version, this watcher deregisters and stops — mirroring
ScoreIndexer.checkSchema's self-stop (README.md:64-69).

Exactly-once note: foreachBatch + our idempotent update (tombstone+append
keyed by url, LWW) gives effective exactly-once on re-delivery, matching the
reference's at-least-once queue + idempotent-upsert contract (T7).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import Catalog, IndexClosedError
from .incremental import incremental_update

DOC_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def watch(
    spark: SparkSession,
    queue_dir: str,
    catalog: Catalog,
    schema_version: str,
    *,
    available_now: bool = True,
    poll_interval: str = "5 seconds",
    max_files_per_trigger: int | None = None,
    compact_every: int | None = None,
) -> dict:
    """Consume document batches from ``queue_dir`` into the index.

    available_now=True (default, and what tests use): process everything
    pending, then stop — the bounded form of the watch loop. False: run
    continuously with `poll_interval` micro-batches until the control
    channel moves the current schema elsewhere (T10) or the stream is
    stopped externally. Returns the final manifest.

    ``compact_every``: auto-compaction threshold (the ES segment-merge
    analog — the reference's store merges continuously): when a batch
    commit leaves >= this many generations, run compact_index inline
    before the next batch. Readers are safe throughout (pinned snapshots +
    gc_pending deferred deletion).
    """
    from ..session import ship_package

    ship_package(spark)
    cat = catalog
    cat.find_or_create_index(schema_version)
    state = {"stop_reason": None}

    reader = spark.readStream.schema(DOC_SCHEMA)
    if max_files_per_trigger:
        # T2-analog backpressure: bound in-flight work per micro-batch
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(queue_dir)

    def process(batch_df, batch_id: int) -> None:
        # T10 control check BEFORE writing: a watcher whose version is no
        # longer current must deregister and stop (ScoreIndexer.cs:72-74)
        current = cat.get_current_schema()
        if current is not None and current != schema_version:
            state["stop_reason"] = f"schema moved to {current}"
            raise IndexClosedError(state["stop_reason"])
        rows = batch_df.persist()
        try:
            if rows.limit(1).count() == 0:
                return
            m = cat.read_manifest(schema_version)
            if not (m and m.get("phases", {}).get("commit")):
                # first batch on a fresh index: full-build semantics
                from ..operators.build import build_index

                build_index(spark, rows, cat, schema_version)
            else:
                # queue semantics: the batch rows ARE the changed documents;
                # rows failing ShouldIndex route to delete inside the update
                m_new = incremental_update(
                    spark, rows, cat, schema_version,
                    queue_urls=rows.select("url"),
                )
                if (
                    compact_every
                    and int(m_new.get("generations", 0)) >= compact_every
                ):
                    from .incremental import compact_index

                    compact_index(spark, cat, schema_version)
            # A2 gauge: pending backlog after this batch, recorded with the
            # manifest counters (the DogStatsd-tagged metrics analog,
            # IndexQueueProcessor.cs:52,57 + PumpAllScoresCommand.cs:93-97)
            m2 = cat.read_manifest(schema_version)
            if m2 is not None:
                m2["queue"] = queue_depth(
                    queue_dir,
                    f"{cat.index_dir(schema_version)}/_stream_checkpoint",
                )
                cat.write_manifest(schema_version, m2)
        finally:
            rows.unpersist()

    writer = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation",
        f"{cat.index_dir(schema_version)}/_stream_checkpoint",
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
    else:
        # parse BEFORE starting the stream: an unsupported unit must fail
        # fast, not crash the driver loop with the query already running
        poll_sec = _interval_seconds(poll_interval)
        q = writer.trigger(processingTime=poll_interval).start()
    try:
        if available_now:
            q.awaitTermination()
        else:
            # T10 timer poll, independent of queue traffic: the reference's
            # checkSchema runs on a 5 s timer whether or not batches arrive
            # (ScoreIndexer.cs:39,52-80). An idle follow-mode stream never
            # enters process() (no new files -> no micro-batch), so the
            # driver polls the control channel between waits and stops the
            # stream on a move — same self-stop, no batch required.
            while q.isActive:
                current = cat.get_current_schema()
                if current is not None and current != schema_version:
                    state["stop_reason"] = f"schema moved to {current}"
                    q.stop()
                    break
                if q.awaitTermination(poll_sec):
                    break
            # the stream may have DIED while the driver was between waits
            # (isActive flipped false without an awaitTermination to raise);
            # surface that failure instead of returning a success-shaped
            # manifest — one bounded await re-raises it if present
            if state["stop_reason"] is None:
                q.awaitTermination(1)
    except Exception:
        # a T10 schema move is the MIRRORED self-stop, not a failure — in
        # BOTH trigger modes (the reference's checkSchema deregisters and
        # returns cleanly, ScoreIndexer.cs:72-74); anything else propagates
        if state["stop_reason"] is None:
            raise
    # final gauge: the in-batch reading runs before the offset commit, so
    # refresh once the stream has fully drained/stopped
    m = cat.read_manifest(schema_version)
    if m is not None:
        m["queue"] = queue_depth(
            queue_dir, f"{cat.index_dir(schema_version)}/_stream_checkpoint"
        )
        cat.write_manifest(schema_version, m)
    out = cat.read_manifest(schema_version) or {}
    if state["stop_reason"]:
        # surfaced, not raised: the T10 self-stop is normal shutdown; the
        # un-consumed batch stays pending for the new schema's watcher
        out = {**out, "stop_reason": state["stop_reason"]}
    return out


def _interval_seconds(interval: str) -> float:
    """'5 seconds' / '500 milliseconds' / '1 day' -> seconds. The unit set
    mirrors what Spark's processingTime trigger itself parses (microsecond
    through week, singular or plural — IntervalUtils unit names; month/year
    are not fixed durations so a trigger rejects them and so do we), so
    this pre-parse only rejects what Spark would also reject. Raises
    ValueError on unknown units so the caller fails BEFORE starting a
    stream it can't poll."""
    num, _, unit = interval.strip().partition(" ")
    key = unit.strip().lower().rstrip("s") or "second"
    mult = {
        "microsecond": 1e-6,
        "millisecond": 0.001,
        "second": 1.0,
        "minute": 60.0,
        "hour": 3600.0,
        "day": 86400.0,
        "week": 604800.0,
    }.get(key)
    if mult is None:
        raise ValueError(f"unsupported trigger interval unit: {interval!r}")
    return float(num) * mult


def push_batch(spark: SparkSession, docs_df, queue_dir: str) -> None:
    """Producer side (S5: queue pump analog) — append a batch of document
    rows to the drop directory; one file set per push."""
    docs_df.select("url", "warc_ts", "html", "text", "lang").write.mode(
        "append"
    ).parquet(queue_dir)


def push_doc(
    spark: SparkSession,
    queue_dir: str,
    url: str,
    text: str | None,
    lang: str = "en",
    warc_ts: str | None = None,
) -> None:
    """Enqueue ONE document — the manual-test affordance of the reference's
    `queue pump-score` / `pump-file` (PumpScoreCommand.cs:11-30,
    PumpFileCommand.cs:12-29). text=None enqueues a delete-shaped row (fails
    ShouldIndex -> routes to delete, IndexQueueProcessor.cs:41-60)."""
    import datetime

    ts = (
        datetime.datetime.fromisoformat(warc_ts)
        if warc_ts
        else datetime.datetime.now(datetime.timezone.utc).replace(tzinfo=None)
    )
    html = ("<body>" + text + "</body>").encode() if text is not None else None
    df = spark.createDataFrame([(url, ts, html, text, lang)], DOC_SCHEMA)
    push_batch(spark, df, queue_dir)


def clear_queue(queue_dir: str) -> int:
    """Drop all pending queue files (ClearQueueCommand.cs analog). Returns
    the number of files removed. The stream checkpoint is untouched —
    already-processed offsets stay valid."""
    import glob
    import os

    n = 0
    for p in glob.glob(os.path.join(queue_dir, "*.parquet")):
        os.remove(p)
        n += 1
    return n


def queue_depth(queue_dir: str, checkpoint_dir: str | None = None) -> dict:
    """A2 queue-length gauge: pending (unprocessed) files and rows in the
    drop directory — the metric the reference's producer throttles on
    (PumpAllScoresCommand.cs:93-97: pause while queue > 1M items).

    Processed files are read from the file-stream checkpoint's source log
    (each committed micro-batch lists the files it consumed); rows come from
    parquet footers only — no data scan."""
    import glob
    import json
    import os

    import pyarrow.parquet as pq

    all_files = {
        os.path.abspath(p)
        for p in glob.glob(os.path.join(queue_dir, "*.parquet"))
    }
    seen: set[str] = set()
    if checkpoint_dir:
        src = os.path.join(checkpoint_dir, "sources", "0")
        if os.path.isdir(src):
            for name in os.listdir(src):
                p = os.path.join(src, name)
                if not os.path.isfile(p) or name.endswith(".crc"):
                    continue
                with open(p) as f:
                    for line in f:
                        line = line.strip()
                        if not line or not line.startswith("{"):
                            continue
                        try:
                            entry = json.loads(line)
                        except json.JSONDecodeError:
                            continue
                        path = entry.get("path", "")
                        # the source log stores a URI — percent-decode it or
                        # paths with spaces/non-ASCII never match the disk
                        # path and the gauge never drains
                        from urllib.parse import unquote, urlparse

                        if "://" in path or path.startswith("file:"):
                            path = unquote(urlparse(path).path)
                        seen.add(os.path.abspath(path))
    pending = sorted(all_files - seen)
    rows = 0
    for p in pending:
        try:
            rows += pq.ParquetFile(p).metadata.num_rows
        except Exception:
            pass
    return {
        "files_total": len(all_files),
        "files_pending": len(pending),
        "rows_pending": rows,
    }
