"""Boolean and phrase queries over the compressed index (query surface the
reference delegates to Elasticsearch — SURVEY.md §3.4).

The reference's consumers query ES with ``bool`` (must / should / must_not)
and ``match_phrase`` queries against the indexed documents
(osu.ElasticIndexer/SchemaSpecs/scores.json defines the searchable mapping;
the query side lives in ES itself). This module re-expresses both Spark-first
over our own index format:

``bool_topk``
    One Spark job for a batch of boolean queries. Same segment-scan plumbing
    as ``wand.wand_topk`` (term_id IN -> row-group pruning, broadcast query
    map), then per-query dense accumulators inside ``applyInPandas``:

      * score:    float64 dense fold over the SCORED terms (must ∪ should),
                  sorted-term order — the exact same left fold as
                  ``wand.taat_topk`` / the oracle, so scores of the
                  surviving docs are bit-identical to a plain BM25 query
                  over the same terms;
      * must:     int16 dense count of distinct must terms present; a doc is
                  eligible iff the count equals the number of must clauses
                  (ES semantics: every must clause matches);
      * must_not: boolean exclusion mask (any posting excludes the doc).

    ES edge semantics preserved: a must term absent from the dictionary
    empties that query's result (no doc can match all must clauses); absent
    should / must_not terms are ignored; with no must clauses a doc is
    eligible when it matches >=1 scored term.

``phrase_topk``
    Match-then-verify phrase search (the position-free-index form of
    Lucene's ``match_phrase``). Positions are deliberately NOT in the index
    (postings are (doc gaps, tf) only — operators/build.py); instead:

      phase 1 (index): conjunctive candidates — docs containing ALL phrase
        terms — scored by BM25 over the phrase's unique terms (dense
        accumulators, same fold as above). Candidate volume is bounded by
        the rarest term's df, exactly the selectivity a positional index
        would exploit.
      phase 2 (source): candidates join docmap (doc_id -> url) and then the
        SOURCE table (url, text) — the reference's architecture keeps the
        row source of truth outside the index and re-reads it by PK
        constantly (IndexQueueProcessor.cs batch fetch) — and an
        Arrow-batched pandas UDF re-tokenizes each candidate's text with
        THE tokenizer (functions/textprep.tokenize) and keeps docs where
        the phrase tokens appear consecutively. One tiny window finishes
        the exact per-query top-k.

    At 100-TB scale the verify join is candidates (small, broadcastable)
    against the source scan — verification IO is ∝ candidate count, not
    corpus size, and the adjacency check never touches the index tables.

``bool_topk_docpart``
    The queries-to-data batch shape for bool queries (see the function
    docstring): blobs shuffle once per docID cell regardless of query
    count, per-cell masks complete by the salted-grid construction.

``prefix_topk``
    ES ``prefix`` query (scoring_boolean rewrite): dictionary RANGE seek
    expansion (term-asc, capped) -> the standard batched wand path.

All paths honor tombstones and closed-index refusal exactly like
``wand_topk``.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import codec
from ..functions.textprep import tokenize
from .wand import (
    B,
    K1,
    RESULT_SCHEMA,
    _index_state,
    _row_to_enc,
    topk_from_dense,
)

# role bit flags carried on the broadcast query map
_SCORED = 1
_MUST = 2
_MUST_NOT = 4


def _normalize_spec(spec) -> dict[str, list[str]]:
    """Accept clause values as raw text or token lists; tokenize + dedup."""

    def toks(v) -> list[str]:
        if v is None:
            return []
        if isinstance(v, str):
            return sorted(set(tokenize(v)))
        out: set[str] = set()
        for item in v:
            out.update(tokenize(item))
        return sorted(out)

    return {
        "must": toks(spec.get("must")),
        "should": toks(spec.get("should")),
        "must_not": toks(spec.get("must_not")),
    }


def _query_plumbing(spark, index_dir: str, all_terms: list[str]):
    """Shared driver-side setup: index state + dictionary lookup + segment
    scan pruned to the batch vocabulary. Returns None when nothing can
    match (no dictionary hits / no committed segments)."""
    from ..session import ship_package
    from ..sources.catalog import assert_index_readable, committed_gen_paths
    from .dictionary import lookup_term_info

    ship_package(spark)
    assert_index_readable(index_dir)  # closed-index parity (wand_topk)
    n_docs, avgdl, commit_seq = _index_state(spark, index_dir)
    term_info = lookup_term_info(spark, index_dir, all_terms)
    tids = [ti[0] for ti in term_info.values()]
    seg_paths = committed_gen_paths(index_dir, "segments")
    if not tids or not seg_paths:
        return None
    segs = spark.read.parquet(*seg_paths).filter(F.col("term_id").isin(tids))
    idf = {
        t: math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
        for t, (_tid, df) in term_info.items()
    }
    state = {
        "fwd_path": tuple(committed_gen_paths(index_dir, "fwd")),
        "tomb_path": tuple(committed_gen_paths(index_dir, "tombstones")),
        "seq": int(commit_seq),
        "avgdl": float(avgdl),
    }
    return segs, term_info, idf, state


def _bool_runner(state: dict, k: int):
    """applyInPandas body for one query's segment rows (term, idf, role,
    n_must columns riding the broadcast qmap join)."""
    fwd_path = state["fwd_path"]
    tomb_path = state["tomb_path"]
    seq = state["seq"]
    avgdl = state["avgdl"]
    kk = int(k)

    def run_query(pdf: pd.DataFrame) -> pd.DataFrame:
        from osu_elastic_indexer_spark.operators.state import (
            load_norms,
            load_tombstones,
        )

        empty = pd.DataFrame(
            {"query_id": [], "rank": [], "doc_id": [], "score": []}
        )
        norms = load_norms(fwd_path, seq)
        tomb = load_tombstones(tomb_path, seq)
        qid = int(pdf["query_id"].iloc[0])
        n_must = int(pdf["n_must"].iloc[0])
        cols = {c: pdf[c].to_numpy() for c in pdf.columns}
        # group this query's segment rows per term (rows ordered by doc_min
        # before decode: disjoint ranges concatenate in docID order)
        per_term: dict[str, dict] = {}
        for i in range(len(pdf)):
            t = cols["term"][i]
            e = per_term.setdefault(
                t,
                {"idf": float(cols["idf"][i]), "role": int(cols["role"][i]),
                 "rows": []},
            )
            e["rows"].append(
                (int(cols["doc_min"][i]),
                 _row_to_enc({c: cols[c][i] for c in pdf.columns}))
            )
        sums = np.zeros(norms.size, dtype=np.float64)
        must_cnt = np.zeros(norms.size, dtype=np.int16)
        excluded = np.zeros(norms.size, dtype=bool)
        seen_must = 0
        # sorted-term accumulation: same left fold as taat_topk/the oracle
        for t in sorted(per_term):
            e = per_term[t]
            e["rows"].sort(key=lambda r: r[0])
            parts = [codec.decode_postings(enc) for _dm, enc in e["rows"]]
            d = np.concatenate([p[0] for p in parts])
            role = e["role"]
            if role & _SCORED:
                tf = np.concatenate([p[1] for p in parts]).astype(np.float64)
                dl = norms[d].astype(np.float64)
                tfn = tf / (tf + K1 * ((1.0 - B) + (B * dl) / avgdl))
                sums[d] += e["idf"] * tfn
            if role & _MUST:
                must_cnt[d] += 1
                seen_must += 1
            if role & _MUST_NOT:
                excluded[d] = True
        if seen_must < n_must:
            # a must term had no segment rows (deleted-only generations):
            # nothing can match all clauses
            return empty
        if n_must:
            sums[must_cnt < n_must] = 0.0
        sums[excluded] = 0.0
        if tomb is not None and tomb.size:
            tt = tomb[tomb < sums.size]
            sums[tt] = 0.0
        top = topk_from_dense(sums, kk)
        return pd.DataFrame(
            {
                "query_id": [qid] * len(top),
                "rank": list(range(1, len(top) + 1)),
                "doc_id": [d for _s, d in top],
                "score": [s for s, _d in top],
            }
        )

    return run_query


def bool_topk(
    spark: SparkSession,
    index_dir: str,
    queries: list[tuple[int, dict]],
    k: int = 10,
) -> DataFrame:
    """Batched ES-style boolean top-k over a built index.

    ``queries``: [(query_id, {"must": ..., "should": ..., "must_not": ...})]
    — clause values are raw text or lists of texts (tokenized with the
    engine tokenizer). Returns (query_id, rank, doc_id, score); a query
    whose must clause cannot match produces no rows.
    """
    specs = [(qid, _normalize_spec(s)) for qid, s in queries]
    all_terms = sorted(
        {t for _qid, s in specs for r in s.values() for t in r}
    )
    if not all_terms:
        return spark.createDataFrame([], RESULT_SCHEMA)
    plumb = _query_plumbing(spark, index_dir, all_terms)
    if plumb is None:
        return spark.createDataFrame([], RESULT_SCHEMA)
    segs, term_info, idf, state = plumb

    qmap_rows = []
    for qid, s in specs:
        if any(t not in term_info for t in s["must"]):
            continue  # ES semantics: unmatched must clause -> empty result
        scored = sorted(set(s["must"]) | set(s["should"]))
        roles: dict[str, int] = {}
        for t in scored:
            if t in term_info:
                roles[t] = roles.get(t, 0) | _SCORED
        for t in s["must"]:
            roles[t] = roles.get(t, 0) | _MUST
        for t in s["must_not"]:
            if t in term_info:
                roles[t] = roles.get(t, 0) | _MUST_NOT
        if not roles:
            continue
        n_must = len(s["must"])
        for t, role in roles.items():
            qmap_rows.append(
                (qid, t, term_info[t][0], idf[t], role, n_must)
            )
    if not qmap_rows:
        return spark.createDataFrame([], RESULT_SCHEMA)
    qmap = spark.createDataFrame(
        qmap_rows,
        "query_id bigint, term string, term_id bigint, idf double, "
        "role int, n_must int",
    )
    grouped = segs.join(F.broadcast(qmap), "term_id")
    return grouped.groupBy("query_id").applyInPandas(
        _bool_runner(state, k), RESULT_SCHEMA
    )


def bool_topk_docpart(
    spark: SparkSession,
    index_dir: str,
    queries: list[tuple[int, dict]],
    k: int = 10,
) -> DataFrame:
    """DOCUMENT-partitioned boolean batch top-k: the ``wand_topk_docpart``
    shape for bool queries — segment rows for the union of the batch's
    terms shuffle ONCE per (generation, salt) docID cell, independent of
    the query count; the role-bit subscription map rides the closure.

    Correct per cell by construction: a doc's postings live wholly inside
    one cell (the salted grid partitions the docID space), so the cell-
    local must-count and exclusion masks are COMPLETE for every doc the
    cell owns — a doc eligible in its cell is eligible globally, and the
    union of per-cell top-ks contains the exact global top-k (cells cover
    disjoint docs; one tiny window finishes). Scores fold sorted-term like
    ``bool_topk``, so both paths are bit-identical.
    """
    specs = [(qid, _normalize_spec(s)) for qid, s in queries]
    all_terms = sorted(
        {t for _qid, s in specs for r in s.values() for t in r}
    )
    if not all_terms:
        return spark.createDataFrame([], RESULT_SCHEMA)
    plumb = _query_plumbing(spark, index_dir, all_terms)
    if plumb is None:
        return spark.createDataFrame([], RESULT_SCHEMA)
    segs, term_info, idf, state = plumb

    # tid -> [(qid, idf, role)] subscriptions + per-qid must-clause counts,
    # closure-shipped (bounded by the batch vocabulary, like the wand path)
    subs: dict[int, list[tuple[int, float, int]]] = {}
    n_must_by_q: dict[int, int] = {}
    for qid, s in specs:
        if any(t not in term_info for t in s["must"]):
            continue  # ES semantics: unmatched must clause -> empty result
        scored = set(s["must"]) | set(s["should"])
        roles: dict[str, int] = {}
        for t in scored:
            if t in term_info:
                roles[t] = roles.get(t, 0) | _SCORED
        for t in s["must"]:
            roles[t] = roles.get(t, 0) | _MUST
        for t in s["must_not"]:
            if t in term_info:
                roles[t] = roles.get(t, 0) | _MUST_NOT
        if not roles:
            continue
        n_must_by_q[qid] = len(s["must"])
        for t, role in roles.items():
            subs.setdefault(term_info[t][0], []).append((qid, idf[t], role))
    if not subs:
        return spark.createDataFrame([], RESULT_SCHEMA)
    tids = sorted(subs)
    segs = segs.filter(F.col("term_id").isin(tids))
    _tid_term = {ti[0]: t for t, ti in term_info.items()}
    fwd_path, tomb_path = state["fwd_path"], state["tomb_path"]
    seq, avgdl = state["seq"], state["avgdl"]
    kk = int(k)

    def score_cell(pdf: pd.DataFrame) -> pd.DataFrame:
        from osu_elastic_indexer_spark.operators.state import (
            load_norms,
            load_tombstones,
        )

        norms = load_norms(fwd_path, seq)
        tomb = load_tombstones(tomb_path, seq)
        lo = int(pdf["doc_min"].min())
        hi = int(pdf["doc_max"].max())
        span = hi - lo + 1
        cols = {c: pdf[c].to_numpy() for c in pdf.columns}
        by_tid: dict[int, list[tuple[int, dict]]] = {}
        for i in range(len(pdf)):
            by_tid.setdefault(int(cols["term_id"][i]), []).append(
                (int(cols["doc_min"][i]),
                 _row_to_enc({c: cols[c][i] for c in pdf.columns}))
            )
        decoded: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        for tid, rows in by_tid.items():
            rows.sort(key=lambda e: e[0])
            parts = [codec.decode_postings(enc) for _dm, enc in rows]
            d = np.concatenate([p[0] for p in parts])
            tf = np.concatenate([p[1] for p in parts]).astype(np.float64)
            dl = norms[d].astype(np.float64)
            tfn = tf / (tf + K1 * ((1.0 - B) + (B * dl) / avgdl))
            decoded[tid] = (d - lo, tfn)
        # per-query term lists present in this cell
        q_terms: dict[int, list[tuple[float, int, int]]] = {}
        for tid, qlist in subs.items():
            if tid not in decoded:
                continue
            for qid, qidf, role in qlist:
                q_terms.setdefault(qid, []).append((qidf, tid, role))
        out_q, out_d, out_s = [], [], []
        for qid, tl in q_terms.items():
            n_must = n_must_by_q[qid]
            sums = np.zeros(span, dtype=np.float64)
            must_cnt = np.zeros(span, dtype=np.int16) if n_must else None
            excluded = None
            # sorted-TERM fold (same order as bool_topk/the oracle)
            for qidf, tid, role in sorted(
                tl, key=lambda e: _tid_term.get(e[1], "")
            ):
                d, tfn = decoded[tid]
                if role & _SCORED:
                    sums[d] += qidf * tfn
                if role & _MUST:
                    must_cnt[d] += 1
                if role & _MUST_NOT:
                    if excluded is None:
                        excluded = np.zeros(span, dtype=bool)
                    excluded[d] = True
            if n_must:
                sums[must_cnt < n_must] = 0.0
            if excluded is not None:
                sums[excluded] = 0.0
            if tomb is not None and tomb.size:
                tt = tomb[(tomb >= lo) & (tomb <= hi)]
                if tt.size:
                    sums[tt - lo] = 0.0
            for s, d in topk_from_dense(sums, kk):
                out_q.append(qid)
                out_d.append(d + lo)
                out_s.append(s)
        return pd.DataFrame(
            {"query_id": out_q, "rank": [0] * len(out_q),
             "doc_id": out_d, "score": out_s}
        )

    cells = segs.groupBy("generation", "salt").applyInPandas(
        score_cell, RESULT_SCHEMA
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        cells.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= kk)
        .select("query_id", "rank", "doc_id", "score")
    )


def prefix_topk(
    spark: SparkSession,
    index_dir: str,
    queries: list[tuple[int, str]],
    k: int = 10,
    max_expansions: int = 50,
) -> DataFrame:
    """ES prefix query (scoring_boolean rewrite): expand each prefix
    against the LIVE dictionary via a footer-stats range seek
    (dictionary.lookup_terms_by_prefix — term-asc, capped at
    ``max_expansions``, ES's rewrite-cap analog), then run the standard
    batched BM25 path over the expanded terms: per-term idf over the
    union, sorted-term fold, so scores are exactly what a plain query on
    the expanded terms would produce. A prefix with no live expansion
    yields no rows for that query.

    A prefix that tokenizes to MORE than one token is rejected: ES's
    ``prefix`` query matches a single term, and silently using only the
    first token would drop the rest of the input without warning."""
    from ..sources.catalog import assert_index_readable
    from .dictionary import lookup_terms_by_prefix
    from .wand import wand_topk

    assert_index_readable(index_dir)  # refuse closed indexes before seeks
    expanded = []
    for qid, prefix in queries:
        toks = tokenize(prefix)
        if not toks:
            continue
        if len(toks) > 1:
            raise ValueError(
                f"prefix query {prefix!r} tokenizes to {len(toks)} tokens "
                f"({toks}); ES prefix queries match a single term — pass "
                "one token (use a bool/phrase query for multi-term input)"
            )
        terms = lookup_terms_by_prefix(index_dir, toks[0], max_expansions)
        if terms:
            expanded.append((qid, " ".join(terms)))
    if not expanded:
        return spark.createDataFrame([], RESULT_SCHEMA)
    return wand_topk(spark, index_dir, expanded, k)


def _contains_phrase(tokens: list[str], phrase: list[str]) -> bool:
    m = len(phrase)
    if m == 0:
        return False
    n = len(tokens)
    if n < m:
        return False
    first = phrase[0]
    return any(
        tokens[i] == first and tokens[i : i + m] == phrase
        for i in range(n - m + 1)
    )


def phrase_topk(
    spark: SparkSession,
    index_dir: str,
    source: DataFrame,
    queries: list[tuple[int, str]],
    k: int = 10,
    docpart: bool = False,
) -> DataFrame:
    """Batched exact phrase top-k (match-then-verify; module doc).

    ``source``: the corpus table with (url, html) — the same rows the index
    was built from (the reference keeps _source outside ES and re-reads by
    PK; scores.json:3-5). Verification re-extracts text from html with the
    SAME extract+tokenize the build used (build.py's byte-identity
    invariant), so the adjacency check runs on exactly the indexed token
    stream. Returns (query_id, rank, doc_id, score) where doc_id is the
    INDEX docID (join docmap for urls) and score is BM25 over the phrase's
    unique terms, bit-identical to a plain query on them.
    """
    phrases = {qid: tokenize(text) for qid, text in queries}
    # phase 1: conjunctive candidates + scores = bool must-query over the
    # phrase's unique terms, with k large enough to keep EVERY candidate
    # (verification prunes after; per-query candidate count is bounded by
    # the rarest term's df)
    bool_queries = [
        (qid, {"must": list(dict.fromkeys(ph))})
        for qid, ph in phrases.items()
        if ph
    ]
    if not bool_queries:
        return spark.createDataFrame([], RESULT_SCHEMA)
    # docpart=True routes candidate generation through the queries-to-data
    # shape (blobs shuffle once per docID cell, independent of the batch
    # size) — same candidates and scores bit-identically, the right form
    # for 10^4-phrase batches sharing head terms
    gen = bool_topk_docpart if docpart else bool_topk
    cands = gen(spark, index_dir, bool_queries, k=2**31 - 1)

    # phase 2: verify adjacency against the source text. candidates ->
    # docmap(url) -> source(text); candidates are the small side.
    from ..sources.catalog import committed_gen_paths

    docmap = spark.read.parquet(*committed_gen_paths(index_dir, "docmap"))
    joined = (
        cands.join(docmap.select("doc_id", "url"), "doc_id")
        .join(source.select("url", "html"), "url")
        .select("query_id", "doc_id", "score", "html")
    )
    phrases_b = {int(q): p for q, p in phrases.items()}

    def verify(batches):
        # absolute import: this body executes on executors (shipped zip)
        from osu_elastic_indexer_spark.functions.textprep import extract_text

        for pdf in batches:
            if len(pdf) == 0:
                continue
            keep = [
                _contains_phrase(
                    tokenize(extract_text(h)), phrases_b.get(int(q), [])
                )
                for q, h in zip(pdf["query_id"], pdf["html"])
            ]
            out = pdf.loc[keep, ["query_id", "doc_id", "score"]]
            if len(out):
                yield out

    verified = joined.mapInPandas(
        verify, "query_id bigint, doc_id bigint, score double"
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        verified.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= int(k))
        .select("query_id", "rank", "doc_id", "score")
    )
