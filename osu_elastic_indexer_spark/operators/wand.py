"""Block-max WAND top-k over the compressed segments table (O3 [ours]).

The query half the reference delegates to Elasticsearch/Lucene
(SURVEY.md §3.4). Batched: a whole query set runs as ONE Spark job —
segment rows for the union of query terms are scanned once (term_id IN
(...) -> parquet row-group pruning), joined to the per-query term lists, and
each query's top-k is computed by an exact block-max WAND inside
applyInPandas (numpy + lazy per-block decode).

Exactness discipline (SURVEY.md §4 #5): upper bounds are used ONLY for
skipping (skip iff bound < current kth score, strictly); final scores are
computed from actual (tf, dl) folded in sorted-term order — the same
accumulation order as the pure-python oracle and the brute-force DataFrame
scorer, so results are rank-identical including tie-breaks (doc_id asc).

Per-term virtual posting list: a term's segment rows (salted sub-ranges ×
generations) cover disjoint docID intervals; ordered by doc_min their block
metadata concatenates into one logical block-addressed list — the salted
merge needs no physical pass (operators/build.py module doc).
"""

from __future__ import annotations

import math
import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import DEFAULT
from ..functions import codec
from ..functions.textprep import tokenize

K1 = DEFAULT.bm25_k1
B = DEFAULT.bm25_b

RESULT_SCHEMA = "query_id bigint, rank int, doc_id bigint, score double"


def _tf_norm(tf: float, dl: float, avgdl: float) -> float:
    return tf / (tf + K1 * (1.0 - B + B * dl / avgdl))


class _TermCursor:
    """Iterator over one term's virtual posting list (segment rows ordered by
    doc_min), with block-level skipping and lazy per-block decode. Document
    lengths come from the doc-indexed ``norms`` array (state.load_norms) —
    postings store (doc gaps, tf) only."""

    __slots__ = (
        "term", "idf", "encs", "norms", "blk_row", "blk_in_row", "blk_first",
        "blk_last", "blk_ub", "n_blocks", "cur_blk", "docs", "tfs", "dls",
        "pos", "cur_doc", "ub",
    )

    def __init__(
        self,
        term: str,
        idf: float,
        rows: list[dict],
        avgdl: float,
        norms: np.ndarray,
    ):
        self.term = term
        self.idf = idf
        self.encs = rows
        self.norms = norms
        blk_row, blk_in_row, firsts, lasts, ubs = [], [], [], [], []
        for ri, enc in enumerate(rows):
            nb = len(enc["block_first"])
            blk_row.extend([ri] * nb)
            blk_in_row.extend(range(nb))
            firsts.extend(enc["block_first"])
            lasts.extend(enc["block_last"])
            for b in range(nb):
                mtf = float(enc["block_max_tf"][b])
                mdl = float(enc["block_min_dl"][b])
                ubs.append(idf * _tf_norm(mtf, mdl, avgdl))
        self.blk_row = np.asarray(blk_row, dtype=np.int64)
        self.blk_in_row = np.asarray(blk_in_row, dtype=np.int64)
        self.blk_first = np.asarray(firsts, dtype=np.int64)
        self.blk_last = np.asarray(lasts, dtype=np.int64)
        self.blk_ub = np.asarray(ubs, dtype=np.float64)
        self.n_blocks = len(self.blk_first)
        self.cur_blk = -1
        self.docs = self.tfs = self.dls = None
        self.pos = 0
        self.cur_doc = -1
        # term-global upper bound
        self.ub = float(self.blk_ub.max()) if self.n_blocks else 0.0
        self._load_block(0)

    def _load_block(self, b: int) -> None:
        if b >= self.n_blocks:
            self.cur_doc = 2**62  # exhausted
            return
        self.cur_blk = b
        enc = self.encs[self.blk_row[b]]
        self.docs, self.tfs = codec.decode_block(enc, int(self.blk_in_row[b]))
        self.dls = self.norms[self.docs]
        self.pos = 0
        self.cur_doc = int(self.docs[0])

    def next_geq(self, target: int) -> None:
        """Advance to the first posting with doc_id >= target."""
        if self.cur_doc >= target:
            return
        if target <= self.blk_last[self.cur_blk]:
            # within current block
            self.pos += int(
                np.searchsorted(self.docs[self.pos :], target, side="left")
            )
            self.cur_doc = int(self.docs[self.pos])
            return
        b = int(np.searchsorted(self.blk_last, target, side="left"))
        if b >= self.n_blocks:
            self.cur_doc = 2**62
            return
        self._load_block(b)
        if target > self.blk_first[b]:
            self.pos = int(np.searchsorted(self.docs, target, side="left"))
            self.cur_doc = int(self.docs[self.pos])

    def advance(self) -> None:
        """Advance by one posting."""
        self.pos += 1
        if self.pos < len(self.docs):
            self.cur_doc = int(self.docs[self.pos])
        else:
            self._load_block(self.cur_blk + 1)

    @property
    def exhausted(self) -> bool:
        return self.cur_doc >= 2**62

    def block_ub_for(self, doc: int) -> float:
        """Upper bound of the block that contains (or is next to contain)
        doc — the block-max part of BMW. Assumes cur_doc <= doc handled by
        caller ordering; uses metadata only (no decode)."""
        b = int(np.searchsorted(self.blk_last, doc, side="left"))
        if b >= self.n_blocks:
            return 0.0
        return float(self.blk_ub[b])

    def block_last_for(self, doc: int) -> int:
        b = int(np.searchsorted(self.blk_last, doc, side="left"))
        if b >= self.n_blocks:
            return 2**62
        return int(self.blk_last[b])

    def contribution(self) -> float:
        tf = float(self.tfs[self.pos])
        dl = float(self.dls[self.pos])
        return self.idf * _tf_norm(tf, dl, float(_AVGDL.val))


class _Box:  # tiny mutable holder so _TermCursor.contribution sees avgdl
    __slots__ = ("val",)

    def __init__(self):
        self.val = 1.0


_AVGDL = _Box()


def taat_topk(
    term_lists: list[tuple[str, float, list[dict]]],
    k: int,
    avgdl: float,
    norms: np.ndarray,
    tombstones: np.ndarray | None = None,
    decode_cache: dict | None = None,
) -> list[tuple[int, float]]:
    """Exact exhaustive term-at-a-time top-k, fully numpy-vectorized.

    ``norms``: doc-indexed dl array (state.load_norms). ``tombstones``:
    sorted deleted-docID array or None — filtered with a vectorized isin
    mask, never a python per-element loop.

    Per-doc sums are accumulated one TERM at a time (sorted term order) into
    a dense candidate array — each posting contributes via exactly one
    `+=`, so the accumulation is the same left fold as the oracle/BMW paths
    (bit-identical scores). NOTE: np.add.reduceat/np.sum are NOT usable here
    — numpy reductions are pairwise, which reorders float addition.

    This is the fast path for small candidate sets: BMW's per-posting python
    loop costs ~5-10us/doc, which loses to vectorized decode below ~10^6
    candidates. The dispatcher in run_query() picks per query; at 10^12-doc
    scale selective queries route to BMW, where skipping wins.

    ``decode_cache``: optional {term: (docs, tfn)} map a long-lived caller
    (the serving tier) passes in — head terms' varbyte decode dominates the
    dense-query latency, and reference query sets share head terms heavily.
    Cached entries hold the QUERY-INDEPENDENT tf-norm (tf/(tf+K1(...)),
    a function of the index's avgdl/norms only), so a warm query pays one
    idf multiply + scatter per term — no norms gather, no division. The
    contrib arithmetic (idf x tfnorm) is the same expression shape as the
    uncached path and the oracle, so scores stay bit-identical. Entries
    are the caller's to bound/evict (LocalSearcher keys a searcher to one
    pinned snapshot, so entries can never go stale within its lifetime).
    """
    per_term: list[tuple[np.ndarray, np.ndarray]] = []
    for t, idf, rows in sorted(term_lists, key=lambda e: e[0]):
        cached = decode_cache.get(t) if decode_cache is not None else None
        if cached is not None:
            d, tfn = cached
        else:
            ds, tfs = [], []
            for enc in rows:  # caller orders rows by doc_min
                dd, tt = codec.decode_postings(enc)
                ds.append(dd)
                tfs.append(tt)
            if not ds:
                continue
            d = np.concatenate(ds)
            tf = np.concatenate(tfs).astype(np.float64)
            dl = norms[d].astype(np.float64)
            # elementwise twin of _tf_norm's scalar expression tree
            tfn = tf / (tf + K1 * ((1.0 - B) + (B * dl) / avgdl))
            if decode_cache is not None:
                decode_cache[t] = (d, tfn)
        per_term.append((d, idf * tfn))
    if not per_term:
        return []
    # dense accumulator sized like the norms array (already O(n_docs)
    # per-shard state this worker holds — SURVEY §7.4 #5's sharding note):
    # per-doc sums land by direct index, one += per term in sorted-term
    # order — the SAME left fold per doc as before, without the
    # np.unique/searchsorted sort of the concatenated posting lists that
    # dominated dense-query latency (docIDs are unique within a term, so
    # fancy-index += is exact)
    if len(per_term) == 1:
        # single-term queries (a large share of real search traffic) never
        # need the dense accumulator: the per-doc score IS the one term's
        # contrib array (docIDs unique within a term, nothing to fold), so
        # top-k runs straight over (docs, contribs) — no O(n_docs) zeros,
        # no scatter, no dense finalize. Tombstones mask by sorted-array
        # probe. Shares _topk_pairs with topk_from_dense, so ties and
        # ordering are bit-identical to the accumulated path.
        d, contrib = per_term[0]
        if tombstones is not None and tombstones.size:
            pos = np.searchsorted(tombstones, d)
            pos[pos == tombstones.size] = tombstones.size - 1
            alive = tombstones[pos] != d
            d, contrib = d[alive], contrib[alive]
        return _topk_pairs(d, contrib, k)
    sums = np.zeros(norms.size, dtype=np.float64)
    est = 0
    for d, contrib in per_term:
        sums[d] += contrib
        est += d.size
    if tombstones is not None and tombstones.size:
        t = tombstones[tombstones < sums.size]
        sums[t] = 0.0
    return topk_from_dense(sums, k, est_matches=est)


def _topk_pairs(
    ids: np.ndarray, vals: np.ndarray, k: int
) -> list[tuple[float, int]]:
    """Shared exact top-k finalize over (doc_id, score>0) pairs: partition
    to the k largest, WIDEN to all ties at the kth value, then one
    (score desc, doc asc) lexsort — the single tie-handling implementation
    every exhaustive scorer funnels through."""
    if k <= 0 or ids.size == 0:
        return []
    if ids.size > k:
        part = np.argpartition(-vals, k - 1)[:k]
        vk = vals[part].min()
        keep = vals >= vk
        ids, vals = ids[keep], vals[keep]
    top = np.lexsort((ids, -vals))[:k]
    return [(float(vals[i]), int(ids[i])) for i in top]


def topk_from_dense(
    sums: np.ndarray, k: int, est_matches: int | None = None
) -> list[tuple[float, int]]:
    """Exact top-k (score desc, doc asc) from a dense per-doc score array
    where matched docs are exactly the nonzero entries (every BM25 contrib
    is > 0). Partition to the k largest, then WIDEN to all ties at the kth
    value before the final lexsort — both exhaustive paths (taat_topk and
    the docpart cell scorer) share this finalization so their tie handling
    can never diverge. ``est_matches``: optional caller estimate of how
    many docs matched (posting volume); when it says the accumulator is
    match-dense, a finalize that skips the full nonzero materialization
    runs instead — same output bit-for-bit."""
    if k <= 0:  # argpartition(kth=k-1) would wrap to -1 and min() an
        return []  # empty slice; bmw_topk has the same guard
    if est_matches is None and sums.size > (1 << 18):
        # no caller estimate on a big span (the bool/phrase runners, whose
        # post-accumulation masks make posting volume a bad proxy): one
        # cheap counting pass measures the TRUE density — count_nonzero is
        # a no-allocation SIMD scan, 2.5-4.5x cheaper than the flatnonzero
        # index build it decides about (measured at 1M: ~2 ms vs 5-9 ms)
        est_matches = int(np.count_nonzero(sums))
    if (
        est_matches is not None
        and sums.size > k
        and 2 * est_matches >= sums.size
    ):
        # dense finalize for MATCH-DENSE accumulators (caller-estimated:
        # total posting volume ~ accumulator span, i.e. head-term
        # queries): partition the accumulator DIRECTLY — the flatnonzero +
        # gather materialization below costs two extra O(n_docs) passes
        # (and ~16 bytes/doc of allocation) that dominate the hot path
        # when most docs matched. When the kth value is 0.0 (< k matched
        # docs) fall through to the sparse path; when it is positive,
        # "score >= vk" selects exactly the docs the nz-based widen kept —
        # identical values, identical (score desc, doc asc) lexsort,
        # bit-identical output.
        part = np.argpartition(-sums, k - 1)[:k]
        vk = sums[part].min()
        if vk > 0.0:
            nz = np.flatnonzero(sums >= vk)
            return _topk_pairs(nz, sums[nz], k)
    nz = np.flatnonzero(sums)
    return _topk_pairs(nz, sums[nz], k)


# BMW pays off above this many total candidate postings (decode-everything
# cost crosses the python-loop cost). Measured at 360k docs: TAAT beats BMW
# ~7x on a dense single-term query ('the': 0.30s vs 2.1s — no skipping is
# possible when every doc matches, so BMW degrades to a per-block python
# loop), and at 1.44M docs the old 1M threshold routed head-term queries to
# BMW for 14-18s p90 while TAAT does them in ~1s. TAAT memory is ~30
# bytes/posting (decoded ids + float64 contribs) -> ~300 MB at this cap,
# safe inside a 4 GB worker alongside the O(n_docs) norms array it already
# holds. Beyond the cap, per-term decode volume makes block-max skipping
# the only sub-linear option.
#
# The bool/phrase per-query runners (boolquery._bool_runner /
# _phrase_runner) tighten this envelope to the query's OBSERVED docID
# range (min doc_min .. max doc_max over its segment rows ~ 11 bytes per
# doc-in-range): only head-term queries approach O(n_docs). Large batches
# on any path belong on the docpart variants, whose accumulators are
# sized to the (generation, salt) CELL span only (boolquery._cell_bounds;
# pinned by tests/test_boolquery.py::test_docpart_accumulators_are_cell_sized).
TAAT_MAX_POSTINGS = 10_000_000


def bmw_topk(
    term_lists: list[tuple[str, float, list[dict]]],
    k: int,
    avgdl: float,
    norms: np.ndarray,
    tombstones: np.ndarray | None = None,
) -> list[tuple[int, float]]:
    """Exact block-max WAND. term_lists: [(term, idf, segment-row dicts)];
    ``norms``: doc-indexed dl array; ``tombstones``: sorted array or None.
    Returns [(score, doc_id)] tuples ordered by (score desc, doc_id asc) —
    same element order as taat_topk (callers unpack ``for score, doc in``).
    """
    from .state import tomb_contains

    _AVGDL.val = avgdl
    cursors = [
        _TermCursor(t, idf, rows, avgdl, norms)
        for t, idf, rows in term_lists
        if rows
    ]
    cursors = [c for c in cursors if not c.exhausted]
    if not cursors or k <= 0:
        return []

    heap: list[tuple[float, int]] = []  # kept sorted by (-score, doc)

    def theta() -> tuple[float, int]:
        if len(heap) < k:
            return (-math.inf, 2**62)
        return heap[-1]

    def offer(doc: int, score: float) -> None:
        th_s, th_d = theta()
        if len(heap) < k or score > th_s or (score == th_s and doc < th_d):
            heap.append((score, doc))
            heap.sort(key=lambda sd: (-sd[0], sd[1]))
            del heap[k:]

    while True:
        cursors = [c for c in cursors if not c.exhausted]
        if not cursors:
            break
        cursors.sort(key=lambda c: c.cur_doc)
        th_s, _ = theta()
        # pivot: first index where cumulative global UB >= theta score
        # (>= is the conservative tie-safe choice; skip only when strictly <)
        acc = 0.0
        pivot = -1
        for i, c in enumerate(cursors):
            acc += c.ub
            if acc >= th_s:
                pivot = i
                break
        if pivot < 0:
            break  # no doc can reach theta
        pivot_doc = cursors[pivot].cur_doc
        if cursors[0].cur_doc == pivot_doc:
            # all terms 0..pivot are at pivot_doc's range; block-max check
            blk_acc = 0.0
            for c in cursors:
                if c.cur_doc > pivot_doc:
                    break
                blk_acc += c.block_ub_for(pivot_doc)
            if blk_acc >= th_s:
                # full evaluation, fold in sorted-term order
                aligned = [c for c in cursors if c.cur_doc == pivot_doc]
                aligned.sort(key=lambda c: c.term)
                if not tomb_contains(tombstones, pivot_doc):
                    score = 0.0
                    for c in aligned:
                        score += c.contribution()
                    offer(pivot_doc, score)
                for c in aligned:
                    c.advance()
            else:
                # NextShallow: nothing in [pivot_doc, d') can beat theta
                d = min(
                    c.block_last_for(pivot_doc)
                    for c in cursors
                    if c.cur_doc <= pivot_doc
                ) + 1
                if pivot + 1 < len(cursors):
                    d = min(d, cursors[pivot + 1].cur_doc)
                d = max(d, pivot_doc + 1)
                for c in cursors:
                    if c.cur_doc < d:
                        c.next_geq(d)
        else:
            # not aligned: advance a term that is strictly behind the pivot
            # (one with cur_doc == pivot_doc must NOT be picked — next_geq
            # would be a no-op and the loop would not progress); choose the
            # largest-UB one (greedy, any strictly-behind term is correct)
            behind = [c for c in cursors[:pivot] if c.cur_doc < pivot_doc]
            cand = max(behind, key=lambda c: c.ub)
            cand.next_geq(pivot_doc)
    return heap


# ---------------------------------------------------------------------------
# Spark orchestration
# ---------------------------------------------------------------------------


def _row_to_enc(row) -> dict:
    return {
        "docs_blob": bytes(row["docs_blob"]),
        "tfs_blob": bytes(row["tfs_blob"]),
        "doc_offs": np.asarray(row["doc_offs"], dtype=np.int64),
        "tf_offs": np.asarray(row["tf_offs"], dtype=np.int64),
        "block_first": np.asarray(row["block_first"], dtype=np.int64),
        "block_last": np.asarray(row["block_last"], dtype=np.int64),
        "block_max_tf": np.asarray(row["block_max_tf"], dtype=np.int64),
        "block_min_dl": np.asarray(row["block_min_dl"], dtype=np.int64),
        "doc_min": int(row["doc_min"]),
    }


# driver-side cache of small per-index state (stats row + tombstone set),
# keyed by the manifest's monotonic commit_seq so any committed change
# invalidates it (mtime is unreliable: coarse-granularity filesystems would
# serve stale state for two commits in the same second) — repeated queries
# skip two Spark jobs each (the p50-latency win)
_INDEX_STATE_CACHE: dict[tuple, tuple] = {}


def manifest_commit_seq(index_dir: str) -> int:
    """The index's monotonic commit counter (0 if no manifest)."""
    import json
    import os

    mpath = f"{index_dir}/manifest.json"
    if not os.path.exists(mpath):
        return 0
    with open(mpath) as f:
        return int(json.load(f).get("commit_seq", 0))


def _index_state(spark: SparkSession, index_dir: str):
    """Driver-side state is SCALARS ONLY (n_docs, avgdl, commit_seq) — the
    tombstone set and the norms array are loaded executor-side from the
    index tables (operators/state.py), never collected to the driver: at
    100 TB with churn a driver collect proportional to delete volume is
    exactly what SURVEY §7.4 #5 forbids."""
    from ..sources.catalog import resolve_table_dir

    key = (index_dir, manifest_commit_seq(index_dir))
    if key in _INDEX_STATE_CACHE:
        return _INDEX_STATE_CACHE[key]
    stats = spark.read.parquet(resolve_table_dir(index_dir, "stats")).collect()[0]
    state = (int(stats.n_docs), float(stats.avgdl), key[1])
    _INDEX_STATE_CACHE.clear()  # keep at most a handful of indexes
    _INDEX_STATE_CACHE[key] = state
    return state


def wand_topk(
    spark: SparkSession,
    index_dir: str,
    queries: list[tuple[int, str]],
    k: int = 10,
) -> DataFrame:
    """Batched top-k over a built index: one Spark job for all queries.

    -> DataFrame (query_id, rank, doc_id, score). Queries whose terms are all
    absent produce no rows (empty result — matches the oracle).
    """
    from ..session import ship_package
    from ..sources.catalog import (
        assert_index_readable,
        committed_gen_paths,
        resolve_table_dir,
    )

    ship_package(spark)
    # closed-index parity: a closed ES index rejects searches too
    # (CloseIndexCommand.cs) — refuse before planning anything
    assert_index_readable(index_dir)
    n_docs, avgdl, commit_seq = _index_state(spark, index_dir)

    # per-query sorted unique terms (scoring dedups terms — oracle parity)
    qterms = [(qid, t) for qid, text in queries for t in sorted(set(tokenize(text)))]
    if not qterms:
        return spark.createDataFrame([], RESULT_SCHEMA)
    all_terms = sorted({t for _, t in qterms})

    # term -> (term_id, df) via the term-SORTED projection's committed
    # generations: the IN filter is pushed to each gen's scan and parquet
    # min/max stats prune to the row groups covering the query terms (the
    # Lucene term-seek analog); per-gen delta rows fold driver-side
    # (<= |terms| x gens rows — operators/dictionary.lookup_term_info)
    from .dictionary import lookup_term_info

    term_info = lookup_term_info(spark, index_dir, all_terms)
    tids = [ti[0] for ti in term_info.values()]
    if not tids:
        return spark.createDataFrame([], RESULT_SCHEMA)

    # idf per term (driver-side, tiny)
    idf = {
        t: math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
        for t, (_tid, df) in term_info.items()
    }

    # (query_id, term, term_id, idf) for terms present in the dictionary
    qmap_rows = [
        (qid, t, term_info[t][0], idf[t]) for qid, t in qterms if t in term_info
    ]
    if not qmap_rows:
        return spark.createDataFrame([], RESULT_SCHEMA)
    qmap = spark.createDataFrame(
        qmap_rows, "query_id bigint, term string, term_id bigint, idf double"
    )

    seg_paths = committed_gen_paths(index_dir, "segments")
    if not seg_paths:
        return spark.createDataFrame([], RESULT_SCHEMA)
    from .build import V1_SEGMENT_COLS

    # positions-free path: prune the v2 positional sidecar (if any) before
    # the blobs ride the group shuffle
    segs = (
        spark.read.parquet(*seg_paths)
        .select(*V1_SEGMENT_COLS)
        .filter(F.col("term_id").isin(tids))
    )
    grouped = segs.join(F.broadcast(qmap), "term_id")

    kk = int(k)
    avgdl_b = avgdl
    # executor-side state handles: workers load norms/tombstones themselves
    # from these committed snapshot paths (cached per worker per commit_seq)
    # — only strings cross the closure, never data
    fwd_path = tuple(committed_gen_paths(index_dir, "fwd"))
    tomb_path = tuple(committed_gen_paths(index_dir, "tombstones"))
    seq = int(commit_seq)

    def run_query(pdf: pd.DataFrame) -> pd.DataFrame:
        from osu_elastic_indexer_spark.operators.state import (
            load_norms,
            load_tombstones,
        )

        norms = load_norms(fwd_path, seq)
        tomb = load_tombstones(tomb_path, seq)
        qid = int(pdf["query_id"].iloc[0])
        term_lists: dict[str, tuple[float, list]] = {}
        # column-array access, not iterrows (row-at-a-time pandas is the
        # slow path even for small segment-row groups)
        cols = {c: pdf[c].to_numpy() for c in pdf.columns}
        for i in range(len(pdf)):
            t = cols["term"][i]
            term_lists.setdefault(t, (float(cols["idf"][i]), []))[1].append(
                _row_to_enc({c: cols[c][i] for c in pdf.columns})
            )
        entries = []
        total_postings = 0
        for t, (tidf, rows) in sorted(term_lists.items()):
            rows.sort(key=lambda e: e["doc_min"])  # disjoint ranges, ordered
            total_postings += sum(len(e["block_first"]) for e in rows) * 128
            entries.append((t, tidf, rows))
        # dispatch: vectorized exhaustive TAAT for small candidate sets,
        # block-max WAND when skipping pays (both exact, same fold order)
        if total_postings <= TAAT_MAX_POSTINGS:
            top = taat_topk(entries, kk, avgdl_b, norms, tomb)
        else:
            top = bmw_topk(entries, kk, avgdl_b, norms, tomb)
        return pd.DataFrame(
            {
                "query_id": [qid] * len(top),
                "rank": list(range(1, len(top) + 1)),
                "doc_id": [d for _s, d in [(s, d) for s, d in top]],
                "score": [s for s, _d in top],
            }
        )

    return grouped.groupBy("query_id").applyInPandas(run_query, RESULT_SCHEMA)


def wand_topk_docpart(
    spark: SparkSession,
    index_dir: str,
    queries: list[tuple[int, str]],
    k: int = 10,
) -> DataFrame:
    """DOCUMENT-partitioned batch top-k: queries go to the data.

    ``wand_topk`` joins segment rows to the query map, so each term's
    compressed blobs are shuffled once PER SUBSCRIBING QUERY — fine for a
    handful of queries, but a 10^4-query batch sharing Zipf head terms
    multiplies the shuffle by the subscription count. This operator is the
    scale shape for large batches (the sharded-Lucene form): segment rows
    for the union of query terms shuffle ONCE, grouped by their
    (generation, salt) docID cell — every doc's postings live wholly inside
    one cell by construction of the salted grid, so per-cell exhaustive
    scoring of ALL queries is exact — then the global top-k per query is
    the top-k of the per-cell winners (disjoint docs, union of candidates).
    Shuffle volume is independent of the query count; the query map rides
    the closure (tiny). Scores fold in sorted-term order per doc, so
    results are rank-identical (bit-identical scores) to wand_topk and the
    oracle; ties break by doc_id via the final exact window.
    """
    from ..session import ship_package
    from ..sources.catalog import assert_index_readable, committed_gen_paths

    ship_package(spark)
    assert_index_readable(index_dir)  # closed-index parity (see wand_topk)
    n_docs, avgdl, commit_seq = _index_state(spark, index_dir)
    qterms = [(qid, t) for qid, text in queries for t in sorted(set(tokenize(text)))]
    if not qterms:
        return spark.createDataFrame([], RESULT_SCHEMA)
    all_terms = sorted({t for _, t in qterms})
    from .dictionary import lookup_term_info

    term_info = lookup_term_info(spark, index_dir, all_terms)
    tids = [ti[0] for ti in term_info.values()]
    if not tids:
        return spark.createDataFrame([], RESULT_SCHEMA)
    idf = {
        t: math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
        for t, (_tid, df) in term_info.items()
    }
    # tid -> [(query_id, idf)] subscription map — closure-shipped (per-term
    # scalars only, bounded by the query batch's vocabulary)
    subs: dict[int, list[tuple[int, float]]] = {}
    for qid, t in qterms:
        if t in term_info:
            tid = term_info[t][0]
            subs.setdefault(tid, []).append((qid, idf[t]))
    seg_paths = committed_gen_paths(index_dir, "segments")
    if not seg_paths or not subs:
        return spark.createDataFrame([], RESULT_SCHEMA)
    from .build import V1_SEGMENT_COLS

    segs = (
        spark.read.parquet(*seg_paths)
        .select(*V1_SEGMENT_COLS)
        .filter(F.col("term_id").isin(tids))
    )

    kk = int(k)
    avgdl_b = avgdl
    fwd_path = tuple(committed_gen_paths(index_dir, "fwd"))
    tomb_path = tuple(committed_gen_paths(index_dir, "tombstones"))
    seq = int(commit_seq)
    _tid_term = {ti[0]: t for t, ti in term_info.items()}

    def score_cell(pdf: pd.DataFrame) -> pd.DataFrame:
        from osu_elastic_indexer_spark.operators.state import (
            load_norms,
            load_tombstones,
        )

        norms = load_norms(fwd_path, seq)
        tomb = load_tombstones(tomb_path, seq)
        # decode each term's cell postings ONCE; score every subscribed
        # query against the decoded arrays (cell-local dense accumulator)
        lo = int(pdf["doc_min"].min())
        hi = int(pdf["doc_max"].max())
        span = hi - lo + 1
        cols = {c: pdf[c].to_numpy() for c in pdf.columns}
        # per-term decoded postings within this cell, ordered by doc_min
        by_tid: dict[int, list[tuple[int, dict]]] = {}
        for i in range(len(pdf)):
            by_tid.setdefault(int(cols["term_id"][i]), []).append(
                (int(cols["doc_min"][i]), _row_to_enc({c: cols[c][i] for c in pdf.columns}))
            )
        decoded: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        for tid, rows in by_tid.items():
            rows.sort(key=lambda e: e[0])
            parts = [codec.decode_postings(enc) for _dm, enc in rows]
            d = np.concatenate([p[0] for p in parts])
            tf = np.concatenate([p[1] for p in parts]).astype(np.float64)
            dl = norms[d].astype(np.float64)
            tfn = tf / (tf + K1 * ((1.0 - B) + (B * dl) / avgdl_b))
            decoded[tid] = (d, tfn)
        # per-query accumulation in sorted-term order (same fold as TAAT)
        q_terms: dict[int, list[tuple[float, int]]] = {}
        for tid, qlist in subs.items():
            if tid not in decoded:
                continue
            for qid, qidf in qlist:
                q_terms.setdefault(qid, []).append((qidf, tid))
        out_q, out_d, out_s = [], [], []
        for qid, tl in q_terms.items():
            sums = np.zeros(span, dtype=np.float64)
            # deterministic order: terms of a query accumulate by tid asc —
            # NOTE tid order == (df desc, term asc) assignment order; the
            # per-doc float fold must match the oracle's sorted-TERM order,
            # so sort by the term string recovered from tid
            for qidf, tid in sorted(tl, key=lambda e: _tid_term.get(e[1], "")):
                d, tfn = decoded[tid]
                sums[d - lo] += qidf * tfn
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
    # exact global top-k: per-cell candidates cover disjoint docs, so the
    # union of per-cell top-ks contains the global top-k; one tiny window
    # (cells x queries x k rows) finishes it
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    return (
        cells.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= kk)
        .select("query_id", "rank", "doc_id", "score")
    )


def wand_topk_with_urls(
    spark: SparkSession, index_dir: str, queries: list[tuple[int, str]], k: int = 10
) -> DataFrame:
    """Results joined back to the docmap for urls (the reference returns the
    document key; _source stays in the input table — scores.json:3-5)."""
    from ..sources.catalog import committed_gen_paths

    res = wand_topk(spark, index_dir, queries, k)
    docmap = spark.read.parquet(
        *committed_gen_paths(index_dir, "docmap")
    ).select("doc_id", "url")
    return res.join(docmap, "doc_id").select(
        "query_id", "rank", "doc_id", "url", "score"
    )
