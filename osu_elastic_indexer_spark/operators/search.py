"""Query side: BM25 statistics, brute-force DataFrame scorer, top-k.

The reference delegates all of this to Elasticsearch/Lucene (the index it
feeds is configured in osu.ElasticIndexer/schemas/scores.json); here it is
built from scratch (BASELINE.json north_star). This module holds the
*relational* query path:

* ``tf_table``      — docs -> (doc_id, term, tf, dl), Arrow-vectorized with
                      map-side combine (one shuffle row per (doc, term))
* ``doc_lengths`` / ``collection_stats`` — A4 term/collection statistics
* ``bm25_topk_brute`` — exact BM25 top-k as a pure DataFrame plan; this is
                      the internal oracle the compressed-index WAND path
                      (operators/wand.py) must match rank-identically

Determinism discipline (SURVEY.md §7.4 #1): per-doc scores are folded in
sorted-term order via aggregate(sort_array(collect_list(...))) — the exact
accumulation order of the pure-python oracle — so floats are bit-reproducible
under any partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import DEFAULT
from ..functions.textprep import tokenize, tokens_map_in_pandas

K1 = DEFAULT.bm25_k1
B = DEFAULT.bm25_b

TF_SCHEMA = "doc_id bigint, term string, tf bigint, dl bigint"


def tf_table(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(docs with id+text) -> term-frequency table (doc_id, term, tf, dl).

    mapInPandas pre-aggregates token counts inside each Arrow batch
    (map-side combine): the downstream shuffle carries (doc, term) rows, not
    token rows — at 100 TB this is the difference between shuffling ~10^14
    tokens and ~10^13 distinct pairs.
    """
    return docs.select(
        F.col(id_col).cast("bigint").alias("doc_id"), F.col(text_col).alias("text")
    ).mapInPandas(tokens_map_in_pandas, schema=TF_SCHEMA)


def doc_lengths(tf: DataFrame) -> DataFrame:
    """(doc_id, dl) — dl is carried on every tf row; max() just picks it."""
    return tf.groupBy("doc_id").agg(F.max("dl").alias("dl"))


def collection_stats(tf: DataFrame) -> DataFrame:
    """1-row DataFrame (n_docs, avgdl). avg over int64 sums is exact ->
    bit-identical to the oracle's sum/n."""
    return doc_lengths(tf).agg(
        F.count("*").alias("n_docs"),
        (F.sum("dl") / F.count("*")).cast("double").alias("avgdl"),
    )


def term_stats(tf: DataFrame) -> DataFrame:
    """(term, df) document frequencies — A4. tf rows are unique per
    (doc, term), so count(*) == countDistinct(doc_id) without the
    distinct-agg expansion."""
    return tf.groupBy("term").agg(F.count("*").alias("df"))


def idf_expr(n_docs, df):
    """Lucene-style BM25 idf: ln(1 + (N - df + 0.5)/(df + 0.5)). float64."""
    return F.log(
        F.lit(1.0) + (n_docs - df + F.lit(0.5)) / (df + F.lit(0.5))
    )


def tf_norm_expr(tf, dl, avgdl):
    """tf / (tf + k1*(1 - b + b*dl/avgdl)). float64."""
    return tf / (tf + F.lit(K1) * (F.lit(1.0 - B) + F.lit(B) * dl / avgdl))


def bm25_contributions(tf: DataFrame, query_terms: list[str]) -> DataFrame:
    """Per-(doc, term) BM25 contributions for the given query terms.

    -> (doc_id, term, contrib). Query terms and per-term df are broadcast —
    the only shuffle is the groupBy in the caller.
    """
    spark = tf.sparkSession
    terms = sorted(set(query_terms))
    if not terms:
        return spark.createDataFrame([], "doc_id bigint, term string, contrib double")
    q = spark.createDataFrame([(t,) for t in terms], "term string")
    matched = tf.join(F.broadcast(q), "term")
    # df per query term: tiny (<= #query terms rows) -> broadcast back
    dfreq = matched.groupBy("term").agg(F.count("*").alias("df"))
    stats = collection_stats(tf)
    return (
        matched.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            "term",
            (
                idf_expr(F.col("n_docs"), F.col("df"))
                * tf_norm_expr(F.col("tf"), F.col("dl"), F.col("avgdl"))
            ).alias("contrib"),
        )
    )


def fold_scores(contribs: DataFrame) -> DataFrame:
    """(doc_id, term, contrib) -> (doc_id, score), folding contributions in
    sorted-term order (bit-reproducible float accumulation; see module doc)."""
    return contribs.groupBy("doc_id").agg(
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("term", "contrib"))),
            F.lit(0.0),
            lambda acc, x: acc + x["contrib"],
        ).alias("score")
    )


def topk(scored: DataFrame, k: int = 10) -> DataFrame:
    """score desc, doc_id asc — physical plan is TakeOrderedAndProject
    (per-partition heap + driver merge of k*P rows, never a global sort)."""
    return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def bm25_topk_brute(tf: DataFrame, query_text: str, k: int = 10) -> DataFrame:
    """Exact BM25 top-k for one query, entirely as a DataFrame plan.

    This is the M1 end-to-end slice (SURVEY.md §7.2) and remains the internal
    truth for the WAND path."""
    return topk(fold_scores(bm25_contributions(tf, tokenize(query_text))), k)


def bm25_scores_fused(
    docs: DataFrame, query_text: str,
    id_col: str = "doc_id", text_col: str = "text",
) -> DataFrame:
    """Exact per-doc BM25 scores with ONE tokenization pass over the corpus
    -> (doc_id, score) for every matching doc; callers apply their own
    round/order/limit (ft_bm25_topk orders by the ROUNDED score like its
    oracle).

    ``bm25_topk_brute``'s plan evaluates its ``tf_table`` subtree three
    times (the matched scan, the per-term-df broadcast, and the
    collection-stats broadcast each re-run the full mapInPandas pass), so
    the corpus is tokenized 3x per query. Here one fused pass emits, per
    doc, a single dl sentinel row (term NULL) plus the (term, tf) rows for
    the QUERY terms only; the result is tiny (n_docs + matches rows), so
    an eager localCheckpoint materializes it once and every downstream
    subtree (stats, df, scoring) reads the checkpoint instead of
    re-tokenizing. Scores, fold order, and tie-breaks are identical to the
    brute path: same tokenizer, same df/avgdl definitions, same
    idf/tf-norm expressions, same sorted-term fold
    (tests/test_search_brute.py pins the equivalence)."""
    spark = docs.sparkSession
    terms = sorted(set(tokenize(query_text)))
    if not terms:
        return spark.createDataFrame([], "doc_id bigint, score double")
    tset = frozenset(terms)

    def fused(batches):
        import pandas as pd

        for pdf in batches:
            out_doc: list[int] = []
            out_term: list[str | None] = []
            out_tf: list[int] = []
            out_dl: list[int] = []
            for doc_id, text in zip(pdf["doc_id"].values, pdf["text"].values):
                toks = tokenize(text)
                dl = len(toks)
                if dl == 0:
                    continue  # tf_table emits nothing for empty docs
                out_doc.append(doc_id)
                out_term.append(None)  # dl sentinel: one per doc with dl>0
                out_tf.append(0)
                out_dl.append(dl)
                counts: dict[str, int] = {}
                for t in toks:
                    if t in tset:
                        counts[t] = counts.get(t, 0) + 1
                for t, c in counts.items():
                    out_doc.append(doc_id)
                    out_term.append(t)
                    out_tf.append(c)
                    out_dl.append(dl)
            yield pd.DataFrame(
                {"doc_id": out_doc, "term": out_term, "tf": out_tf, "dl": out_dl}
            )

    rows = (
        docs.select(
            F.col(id_col).cast("bigint").alias("doc_id"),
            F.col(text_col).alias("text"),
        )
        .mapInPandas(fused, schema=TF_SCHEMA)
        .localCheckpoint()
    )
    stats = rows.filter(F.col("term").isNull()).agg(
        F.count("*").alias("n_docs"),
        (F.sum("dl") / F.count("*")).cast("double").alias("avgdl"),
    )
    matched = rows.filter(F.col("term").isNotNull())
    dfreq = matched.groupBy("term").agg(F.count("*").alias("df"))
    contribs = (
        matched.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            "term",
            (
                idf_expr(F.col("n_docs"), F.col("df"))
                * tf_norm_expr(F.col("tf"), F.col("dl"), F.col("avgdl"))
            ).alias("contrib"),
        )
    )
    return fold_scores(contribs)
