"""ES aggregations over stored docmap fields — terms and stats aggs.

The reference's consumers don't just rank with ES, they AGGREGATE: bucket
counts over keyword fields (the country/ruleset breakdown next to every
leaderboard) and numeric summaries over doc-value fields — the
`aggs: {terms: {field: ...}}` / `{stats: {field: ...}}` surface over the
keyword/numeric columns `schemas/scores.json` declares. Our docmap carries
those columns per generation (build_index keyword_fields/numeric_fields),
so both aggs are pure declarative DataFrame plans over it:

* ``terms_agg``: filters (pushed to the parquet scan) -> tombstone
  anti-join -> groupBy(field).count() -> top-k by (count desc, value asc).
  Catalyst runs a partial (map-side) count before the single shuffle on
  the bucket key, and AQE coalesces the tiny post-agg partitions; the
  shuffle carries one row per (partition, distinct value), never the doc
  rows — at 100 TB that is the same plan a hand-built sketch would
  approximate, exact. Missing (null) values are skipped, ES semantics.
* ``stats_agg``: one full aggregate (count/min/max/avg/sum) — map-side
  partials, one-row result, no shuffle of data rows.

The serving tier mirrors both JVM-free over the cached doc-value column
(state.load_sort_column) + the cached filter docID arrays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .boolquery import index_numeric_fields
from .sortquery import (
    _apply_filters,
    _sort_field_sql_type,
    _validated_filters,
    sortable_fields,
)


def _filtered_docmap(
    spark: SparkSession, index_dir: str, filter_term, filter_range
) -> DataFrame | None:
    """Committed docmap generations with filter context applied and
    tombstoned docs removed — the shared scan both aggs start from."""
    from ..sources.catalog import assert_index_readable, committed_gen_paths

    assert_index_readable(index_dir)
    fr, ft = _validated_filters(index_dir, filter_term, filter_range)
    dm_paths = committed_gen_paths(index_dir, "docmap")
    if not dm_paths:
        return None
    docmap = _apply_filters(spark.read.parquet(*dm_paths), fr, ft)
    tomb_paths = committed_gen_paths(index_dir, "tombstones")
    if tomb_paths:
        tombs = spark.read.parquet(*tomb_paths).select("doc_id")
        docmap = docmap.join(tombs, "doc_id", "left_anti")
    return docmap


def terms_agg(
    spark: SparkSession,
    index_dir: str,
    field: str,
    k: int = 10,
    filter_term: dict | None = None,
    filter_range: dict | None = None,
) -> DataFrame:
    """ES ``terms`` aggregation: top-k buckets of a stored docmap field by
    document count (count desc, bucket value asc on ties — ES's order),
    under optional filter context. Missing (null) values form no bucket
    (ES skips them). Returns (<field>, doc_count)."""
    if field not in sortable_fields(index_dir):
        raise ValueError(
            f"terms_agg field {field!r} not a stored docmap field of this "
            f"index; it carries: {list(sortable_fields(index_dir))}"
        )
    docmap = _filtered_docmap(spark, index_dir, filter_term, filter_range)
    if docmap is None:
        # bucket column typed from the field's DECLARED type (numeric ->
        # double, warc_ts -> timestamp) to match the non-empty plan
        return spark.createDataFrame(
            [],
            f"{field} {_sort_field_sql_type(index_dir, field)}, "
            "doc_count bigint",
        )
    return (
        docmap.filter(F.col(field).isNotNull())
        .groupBy(field)
        .agg(F.count(F.lit(1)).alias("doc_count"))
        .orderBy(F.desc("doc_count"), F.asc(field))
        .limit(int(k))
    )


def stats_agg(
    spark: SparkSession,
    index_dir: str,
    field: str,
    filter_term: dict | None = None,
    filter_range: dict | None = None,
) -> DataFrame:
    """ES ``stats`` aggregation over a declared NUMERIC doc-value field:
    one row of (cnt, min_v, max_v, avg_v, sum_v) — count counts docs WITH
    a value, min/max/avg/sum ignore nulls, all ES semantics. Map-side
    partials, one-row result."""
    if field not in index_numeric_fields(index_dir):
        raise ValueError(
            f"stats_agg field {field!r} not a declared numeric doc-value "
            f"field; this index carries: "
            f"{list(index_numeric_fields(index_dir))} (declare at build "
            "time via build_index(numeric_fields=...))"
        )
    docmap = _filtered_docmap(spark, index_dir, filter_term, filter_range)
    if docmap is None:
        return spark.createDataFrame(
            [],
            "cnt bigint, min_v double, max_v double, avg_v double, "
            "sum_v double",
        )
    return docmap.agg(
        F.count(field).cast("bigint").alias("cnt"),
        F.min(field).cast("double").alias("min_v"),
        F.max(field).cast("double").alias("max_v"),
        F.avg(field).cast("double").alias("avg_v"),
        F.sum(field).cast("double").alias("sum_v"),
    )
