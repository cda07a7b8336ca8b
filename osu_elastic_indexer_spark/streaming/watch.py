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
) -> dict:
    """Consume document batches from ``queue_dir`` into the index.

    available_now=True (default, and what tests use): process everything
    pending, then stop — the bounded form of the watch loop. False: run
    continuously with `poll_interval` micro-batches until the control
    channel moves the current schema elsewhere (T10) or the stream is
    stopped externally. Returns the final manifest.
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
                incremental_update(
                    spark, rows, cat, schema_version,
                    queue_urls=rows.select("url"),
                )
        finally:
            rows.unpersist()

    writer = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation",
        f"{cat.index_dir(schema_version)}/_stream_checkpoint",
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
    else:
        q = writer.trigger(processingTime=poll_interval).start()
        try:
            q.awaitTermination()
        except Exception:
            if state["stop_reason"] is None:
                raise
    return cat.read_manifest(schema_version)


def push_batch(spark: SparkSession, docs_df, queue_dir: str) -> None:
    """Producer side (S5: queue pump analog) — append a batch of document
    rows to the drop directory; one file set per push."""
    docs_df.select("url", "warc_ts", "html", "text", "lang").write.mode(
        "append"
    ).parquet(queue_dir)
