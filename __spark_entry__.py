"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship BM25 top-10 over sf0.001 documents.
``queries()`` — one named DataFrame callable per implemented operator from
SURVEY.md §2; ``oracle_sql()`` — DuckDB-equivalent ANSI SQL per query.

Float discipline for the value-hash compare: exact-decimal sums for money
aggregates (order-independent), ordered folds + ROUND(...,4) for BM25 (the
oracle SQL uses SUM(... ORDER BY term) to reproduce the engine's sorted-term
accumulation; see osu_elastic_indexer_spark/operators/search.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from osu_elastic_indexer_spark.operators import search as S
from osu_elastic_indexer_spark.functions.textprep import tokenize

# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from osu_elastic_indexer_spark.session import ship_package

    ship_package(spark)  # workers need the package even if driver cwd differs
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _dec_sum(col, alias):
    """Order-independent exact sum of a double column -> double."""
    return F.sum(F.col(col).cast("decimal(38,6)")).cast("double").alias(alias)


def _en_docs(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.filter(
        (F.col("lang") == "en") & F.col("text").isNotNull() & (F.length("text") > 0)
    )


_EN_DOCS_SQL = (
    "SELECT doc_id, text FROM documents "
    "WHERE lang = 'en' AND text IS NOT NULL AND length(text) > 0"
)

# tokenization used for SQL-oracle fulltext queries (ASCII corpus: identical
# to the engine tokenizer in functions/textprep.py)
_TOKS_SQL = f"""
  docs AS ({_EN_DOCS_SQL}),
  toks AS (
    SELECT doc_id, t.term
    FROM docs, unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS t(term)
    WHERE t.term <> ''
  ),
  tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2),
  dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM toks GROUP BY 1),
  stats AS (
    SELECT count(*)::BIGINT AS n_docs,
           CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
    FROM dl
  )
"""


def _bm25_sql(query_terms: list[str], k: int = 10) -> str:
    terms = ", ".join(f"'{t}'" for t in sorted(set(query_terms)))
    return f"""
WITH {_TOKS_SQL},
  q(term) AS (SELECT unnest([{terms}])),
  dfreq AS (SELECT term, count(*)::BIGINT AS df FROM tf JOIN q USING (term) GROUP BY 1),
  contrib AS (
    SELECT tf.doc_id, tf.term,
           ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
             * (tf / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))) AS contrib
    FROM tf JOIN q USING (term) JOIN dfreq USING (term)
        JOIN dl USING (doc_id) CROSS JOIN stats
  )
SELECT doc_id, ROUND(SUM(contrib ORDER BY term), 4) AS score
FROM contrib GROUP BY doc_id
ORDER BY score DESC, doc_id ASC LIMIT {k}
"""


def _bm25_spark(spark, sf_dir, query_text: str, k: int = 10) -> DataFrame:
    tf = S.tf_table(_en_docs(spark, sf_dir))
    scored = S.fold_scores(S.bm25_contributions(tf, tokenize(query_text)))
    return (
        scored.select("doc_id", F.round("score", 4).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


FLAGSHIP_QUERY = "hash join"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: BM25 top-10 for 'hash join' on sf0.001 documents."""
    return _bm25_spark(spark, "/root/testdata/sf0.001", FLAGSHIP_QUERY, 10)


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------


def q_ft_bm25_topk(spark, sf_dir):
    """O3 [ours]: exact BM25 top-k as a DataFrame plan (brute-force path).
    Reference capability delegated to ES (SURVEY.md §2.5 O3)."""
    return _bm25_spark(spark, sf_dir, FLAGSHIP_QUERY, 10)


def q_ft_term_stats(spark, sf_dir):
    """A4: per-term document frequency (top 20 by df desc, term asc)."""
    tf = S.tf_table(_en_docs(spark, sf_dir))
    return (
        S.term_stats(tf)
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(20)
        .select("term", F.col("df").cast("bigint").alias("df"))
    )


def q_ft_collection_stats(spark, sf_dir):
    """A4: collection stats (n_docs, avgdl rounded)."""
    tf = S.tf_table(_en_docs(spark, sf_dir))
    st = S.collection_stats(tf)
    return st.select(
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.round("avgdl", 6).alias("avgdl"),
    )


def q_ft_doc_lengths(spark, sf_dir):
    """O2-analog: per-doc token length (top 50 longest, doc_id tiebreak)."""
    tf = S.tf_table(_en_docs(spark, sf_dir))
    return (
        S.doc_lengths(tf)
        .orderBy(F.desc("dl"), F.asc("doc_id"))
        .limit(50)
        .select("doc_id", F.col("dl").cast("bigint").alias("dl"))
    )


def q_s1_cursor_scan(spark, sf_dir):
    """S1+S2: keyset-cursor resume scan with pinned upper bound
    (ElasticModel.cs:22-55): rows with cursor > resume-point, bounded by
    MAX(id) pinned before the scan."""
    ev = _t(spark, sf_dir, "events")
    pinned = ev.agg(F.max("event_id").alias("max_id"))
    return (
        ev.join(F.broadcast(pinned))
        .filter((F.col("event_id") > 5000) & (F.col("event_id") <= F.col("max_id")))
        .select("event_id", "user_id", "event_type")
    )


def q_a1_max_cursor(spark, sf_dir):
    """A1: MAX(id) scan bound (ElasticModel.cs:35-39)."""
    return _t(spark, sf_dir, "events").agg(
        F.max("event_id").cast("bigint").alias("max_id")
    )


def q_j1_three_way_join(spark, sf_dir):
    """J1: fact ⋈ dim ⋈ dim enrichment (Score.cs:19-21 3-way join),
    aggregated to per-nation revenue. Dims broadcast."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            _dec_sum("o_totalprice", "revenue"),
        )
        .orderBy("n_name")
    )


def q_j2_anti_join(spark, sf_dir):
    """J2: left-anti delete detection (queued ids missing from source →
    deletions, ElasticModel.cs:63-65): customers with no orders."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


def q_j2_semi_join(spark, sf_dir):
    """J2 complement: queued ids that resolve (semi join) — count per segment."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count("*").cast("bigint").alias("n_customers"))
        .orderBy("c_mktsegment")
    )


def q_j3_dedup_lww(spark, sf_dir):
    """J3+T11: last-write-wins dedup by key (ToDictionary re-key,
    IndexQueueProcessor.cs:46): latest event per user."""
    from pyspark.sql.window import Window

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type")
    )


def q_p1_route_split(spark, sf_dir):
    """P1+U1: ShouldIndex routing (Score.cs:33; IndexQueueProcessor.cs:41-60)
    — add/delete action per document, counted."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.withColumn(
            "action",
            F.when(
                (F.col("lang") == "en")
                & F.col("text").isNotNull()
                & (F.length("text") > 0),
                F.lit("add"),
            ).otherwise(F.lit("delete")),
        )
        .groupBy("action")
        .agg(F.count("*").cast("bigint").alias("n"))
        .orderBy("action")
    )


def q_p4_json_extract(spark, sf_dir):
    """P4: embedded-JSON column extraction (Score.cs:46-52 data->mods):
    events.props -> k, summed per event_type."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.withColumn("k", F.get_json_object("props", "$.k").cast("bigint"))
        .groupBy("event_type")
        .agg(F.sum("k").cast("bigint").alias("sum_k"))
        .orderBy("event_type")
    )


def q_p5_derived_bool(spark, sf_dir):
    """P5: derived boolean columns (convert/is_legacy, Score.cs:56-59,97-98):
    flag per order, counted."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.withColumn("is_high", F.col("o_totalprice") > 100000.0)
        .withColumn("is_open", F.col("o_orderstatus") == "O")
        .groupBy("is_high", "is_open")
        .agg(F.count("*").cast("bigint").alias("n"))
        .orderBy("is_high", "is_open")
    )


def q_p6_null_default(spark, sf_dir):
    """P6: null-coalesce default (country_code ??= 'XX',
    PumpAllScoresCommand.cs:87)."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.select(
            "doc_id", F.coalesce(F.col("lang"), F.lit("xx")).alias("lang_or_default")
        )
        .groupBy("lang_or_default")
        .agg(F.count("*").cast("bigint").alias("n"))
        .orderBy("lang_or_default")
    )


def q_a3_counters(spark, sf_dir):
    """A3: per-segment counters (docs, bytes — ListIndicesCommand.cs:37-51):
    TPC-H-Q1-style groupBy with exact decimal sums."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            _dec_sum("l_quantity", "sum_qty"),
            _dec_sum("l_extendedprice", "sum_price"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q_o2_sorted_topn(spark, sf_dir):
    """O2: clustered-sort top-N (index sort, schemas/scores.json:52-57):
    TakeOrderedAndProject, never a global sort."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.orderBy(
            F.desc("l_extendedprice"), F.asc("l_orderkey"), F.asc("l_linenumber")
        )
        .limit(20)
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "ft_bm25_topk": q_ft_bm25_topk,
        "ft_term_stats": q_ft_term_stats,
        "ft_collection_stats": q_ft_collection_stats,
        "ft_doc_lengths": q_ft_doc_lengths,
        "s1_cursor_scan": q_s1_cursor_scan,
        "a1_max_cursor": q_a1_max_cursor,
        "j1_three_way_join": q_j1_three_way_join,
        "j2_anti_join": q_j2_anti_join,
        "j2_semi_join": q_j2_semi_join,
        "j3_dedup_lww": q_j3_dedup_lww,
        "p1_route_split": q_p1_route_split,
        "p4_json_extract": q_p4_json_extract,
        "p5_derived_bool": q_p5_derived_bool,
        "p6_null_default": q_p6_null_default,
        "a3_counters": q_a3_counters,
        "o2_sorted_topn": q_o2_sorted_topn,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "ft_bm25_topk": _bm25_sql(tokenize(FLAGSHIP_QUERY), 10),
        "ft_term_stats": f"""
WITH {_TOKS_SQL}
SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term
ORDER BY df DESC, term ASC LIMIT 20
""",
        "ft_collection_stats": f"""
WITH {_TOKS_SQL}
SELECT n_docs, ROUND(avgdl, 6) AS avgdl FROM stats
""",
        "ft_doc_lengths": f"""
WITH {_TOKS_SQL}
SELECT doc_id, dl FROM dl ORDER BY dl DESC, doc_id ASC LIMIT 50
""",
        "s1_cursor_scan": """
SELECT event_id, user_id, event_type FROM events
WHERE event_id > 5000 AND event_id <= (SELECT max(event_id) FROM events)
""",
        "a1_max_cursor": "SELECT max(event_id)::BIGINT AS max_id FROM events",
        "j1_three_way_join": """
SELECT n_name, count(*)::BIGINT AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS revenue
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name ORDER BY n_name
""",
        "j2_anti_join": """
SELECT c_custkey, c_name FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
ORDER BY c_custkey
""",
        "j2_semi_join": """
SELECT c_mktsegment, count(*)::BIGINT AS n_customers FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_mktsegment ORDER BY c_mktsegment
""",
        "j3_dedup_lww": """
SELECT user_id, event_id, event_type FROM (
  SELECT user_id, event_id, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
""",
        "p1_route_split": """
SELECT CASE WHEN lang = 'en' AND text IS NOT NULL AND length(text) > 0
            THEN 'add' ELSE 'delete' END AS action,
       count(*)::BIGINT AS n
FROM documents GROUP BY 1 ORDER BY action
""",
        "p4_json_extract": """
SELECT event_type, sum(CAST(json_extract_string(props, '$.k') AS BIGINT))::BIGINT AS sum_k
FROM events GROUP BY event_type ORDER BY event_type
""",
        "p5_derived_bool": """
SELECT o_totalprice > 100000.0 AS is_high, o_orderstatus = 'O' AS is_open,
       count(*)::BIGINT AS n
FROM orders GROUP BY 1, 2 ORDER BY is_high, is_open
""",
        "p6_null_default": """
SELECT coalesce(lang, 'xx') AS lang_or_default, count(*)::BIGINT AS n
FROM documents GROUP BY 1 ORDER BY lang_or_default
""",
        "a3_counters": """
SELECT l_returnflag, l_linestatus, count(*)::BIGINT AS n_rows,
       CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_price
FROM lineitem GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
        "o2_sorted_topn": """
SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC LIMIT 20
""",
    }
