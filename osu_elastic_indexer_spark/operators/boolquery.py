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
      * required: int16 dense count of distinct REQUIRED terms present
                  (must ∪ filter); a doc is eligible iff the count equals
                  the number of required clauses (ES semantics: every
                  must AND every filter clause matches);
      * must_not: boolean exclusion mask (any posting excludes the doc).

    ``minimum_should_match``: eligibility additionally requires matching
    at least N DISTINCT should terms (counted via a _SHOULD role bit in
    the same dense pass; ES's parameter of the same name — integer form).
    Defaults follow ES: 0 with required clauses present, and pure-should
    queries already require >=1 scored match by construction. No
    zero-score tail can exist under msm >= 1 (a should match always
    contributes positive score).

    ES filter context (all four bool clause types): ``filter`` terms are
    required like must but contribute ZERO score — a doc that matches
    every required clause yet no scored term matches with score 0.0
    (exactly ES's filter-context scoring), ranked after every positive
    doc, doc_id ascending. ``filter_range`` restricts by the STRUCTURED
    fields the docmap carries (url — the document key, scores.json's
    range-indexed ``id`` analog — and warc_ts): per field an inclusive
    [lo, hi], evaluated executor-side via a pushed pyarrow range scan of
    the docmap (operators/state.load_docids_in_range, cached per worker
    per range). ``filter_term`` exact-matches the index's DECLARED
    keyword fields (build_index(keyword_fields=...), e.g. lang) plus the
    structured fields — the ES term/terms filter the reference's
    consumers run on country_code / rank / ruleset_id
    (scores.json:17-19,32-37); same pushed pyarrow scan discipline
    (state.load_docids_eq), byte-budgeted worker cache.

    Filter context counts as "required clauses present" for the msm
    default AND the zero-score tail (ES semantics): a should+filter spec
    with msm 0 returns filter-matching docs at score 0.0 even when no
    should term matches — including docs carrying NONE of the query's
    terms, enumerated from the intersected filter docIDs (indexed docs
    only, dl > 0). An explicit minimum_should_match >= 1 suppresses the
    tail, as in ES. One documented divergence: a spec whose every term
    clause is out-of-vocabulary returns empty even with filter context
    (the all-zero result set never touches the inverted index — run a
    docmap DataFrame filter instead).

    ES edge semantics preserved: a required term absent from the dictionary
    empties that query's result (no doc can match all required clauses);
    absent should / must_not terms are ignored; with no required clauses a
    doc is eligible when it matches >=1 scored term. A spec with no term
    clause at all (must_not-only, filter_range-only, empty) raises
    ValueError: must_not-only would be ES match_all-minus-excluded (a
    corpus scan, not an index query — returning empty would silently lie),
    and filter_range-only never touches the inverted index (express it as
    a plain docmap/source DataFrame filter instead).

    Memory envelope (per-query path): the runner allocates dense per-query
    accumulators sized to the query's OBSERVED docID range (min doc_min ..
    max doc_max over its segment rows; float64 sums + int16 required-count
    + bool exclusion ≈ 11 bytes/doc-in-range) per concurrently running
    query group — a rare-term query allocates its term span, and only a
    head-term query approaches the corpus span (the wand.py ``taat_topk``
    note's envelope). LARGE batches still belong on ``bool_topk_docpart``,
    whose accumulators are sized to the (generation, salt) CELL span and
    whose shuffle volume is independent of the batch size.

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

    At 100-TB scale the verify join is candidates (BOUNDED by
    ``max_candidates``, then broadcast-PINNED) against the source scan —
    verification IO is ∝ candidate count, not corpus size, the source
    never shuffles, and the adjacency check never touches the index
    tables. Stopword phrases whose candidates exceed the bound are
    refused (ES rewrite-guard analog) unless the caller explicitly opts
    into a corpus-scan join.

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

# role bit flags carried on the broadcast query map: _MUST marks a REQUIRED
# term (must ∪ filter — eligibility), _SCORED a scoring one (must ∪ should);
# a filter term is _MUST without _SCORED
_SCORED = 1
_MUST = 2
_MUST_NOT = 4
_SHOULD = 8  # counted for minimum_should_match eligibility

_SPEC_KEYS = {
    "must", "should", "must_not", "filter", "filter_range", "filter_term",
    "filter_exists", "minimum_should_match",
}
# structured fields EVERY docmap carries (url = document key — the analog of
# scores.json's range-indexed `id`; warc_ts = the capture timestamp);
# KEYWORD fields declared at build time (build_index(keyword_fields=...),
# recorded in the manifest) extend the filter_term-able set per index
_RANGE_FIELDS = {"url", "warc_ts"}


def _normalize_spec(spec) -> dict:
    """Accept clause values as raw text or token lists; tokenize + dedup.

    ES per-clause ``boost``: items in the SCORED clause lists (must /
    should) may be ``{"query"/"term": text, "boost": factor}`` dicts or
    ``(text, factor)`` pairs. The returned ``"boosts"`` map gives each
    term its effective factor — the PRODUCT of the boosts of every scored
    clause containing it (unboosted clauses contribute 1.0, so unboosted
    specs score exactly as before; the engine dedups a term shared by
    must and should into one scored contribution, and the product rule is
    that dedup's boost analog). Boost on must_not/filter is rejected —
    ES ignores it there (those clauses never score), and silently
    accepting it would hide a spec bug."""
    boosts: dict[str, float] = {}

    def one(item, clause: str) -> set[str]:
        b = None
        if isinstance(item, dict):
            if not {"query", "term"} & set(item) or set(item) - {
                "query", "term", "boost"
            }:
                raise ValueError(
                    f"clause item {item!r} must be "
                    '{"query"/"term": text, "boost": factor}'
                )
            b = item.get("boost")
            item = item.get("query", item.get("term"))
        elif (
            isinstance(item, tuple)
            and len(item) == 2
            and isinstance(item[0], str)
            and isinstance(item[1], (int, float))
            and not isinstance(item[1], bool)
        ):
            item, b = item
        ts = set(tokenize(item))
        if b is not None:
            if clause not in ("must", "should"):
                raise ValueError(
                    f"boost on a {clause} clause has no effect (ES scores "
                    "neither must_not nor filter context) — remove it"
                )
            b = float(b)
            if not b > 0.0:
                raise ValueError("boost must be > 0")
            for t in ts:
                boosts[t] = boosts.get(t, 1.0) * b
        return ts

    def toks(v, clause: str) -> list[str]:
        if v is None:
            return []
        if isinstance(v, (str, dict)) or (
            isinstance(v, tuple) and len(v) == 2
            and isinstance(v[0], str)
            and isinstance(v[1], (int, float))
            and not isinstance(v[1], bool)
        ):
            v = [v]
        out: set[str] = set()
        for item in v:
            out.update(one(item, clause))
        return sorted(out)

    out = {
        "must": toks(spec.get("must"), "must"),
        "should": toks(spec.get("should"), "should"),
        "must_not": toks(spec.get("must_not"), "must_not"),
        "filter": toks(spec.get("filter"), "filter"),
    }
    out["boosts"] = {k: v for k, v in boosts.items() if v != 1.0}
    return out


def index_keyword_fields(index_dir: str) -> tuple[str, ...]:
    """Keyword columns this index's docmap carries (declared at build via
    ``build_index(keyword_fields=...)``, recorded in the manifest) — the
    fields ``filter_term`` may restrict on. Empty for pre-keyword indexes."""
    from ..sources.catalog import read_index_manifest

    m = read_index_manifest(index_dir)
    return tuple((m or {}).get("keyword_fields") or ())


def index_numeric_fields(index_dir: str) -> tuple[str, ...]:
    """NUMERIC doc-value columns this index's docmap carries (declared at
    build via ``build_index(numeric_fields=...)`` — the ES doc_values
    analog of scores.json's numeric sort/range fields). ``filter_range``
    and ``filter_term`` accept them; ``sort_topk`` sorts on them."""
    from ..sources.catalog import read_index_manifest

    m = read_index_manifest(index_dir)
    return tuple((m or {}).get("numeric_fields") or ())


def _check_spec(
    spec: dict, s: dict[str, list[str]], keyword_fields: tuple = (),
    numeric_fields: tuple = (),
) -> tuple[dict[str, tuple], dict[str, tuple], tuple]:
    """Validate a bool spec; -> (normalized {field: (lo, hi)} filter_range,
    normalized {field: (value, ...)} filter_term, (field, ...)
    filter_exists — the ES ``exists`` query, docs whose stored field is
    non-null, e.g. the reference's nullable pp field).

    ``filter_range`` accepts the structured fields every docmap carries
    (url, warc_ts) plus this index's declared NUMERIC doc-value fields
    (the ES numeric-range query over total_score/pp-style fields);
    ``filter_term`` additionally accepts the declared keyword fields.

    Raises ValueError for unusable specs instead of returning empty (the
    silent-empty failure modes users actually hit): unknown keys, bad
    range/term fields or shapes, and specs with NO term clause
    (must_not-only / filter-context-only / empty — see the module doc)."""
    unknown = set(spec) - _SPEC_KEYS
    if unknown:
        raise ValueError(
            f"unknown bool spec key(s) {sorted(unknown)}; "
            f"supported: {sorted(_SPEC_KEYS)}"
        )
    fr_in = spec.get("filter_range") or {}
    if not isinstance(fr_in, dict):
        raise ValueError("filter_range must be {field: (lo, hi)}")
    rangeable = _RANGE_FIELDS | set(numeric_fields)
    fr: dict[str, tuple] = {}
    for field, bounds in fr_in.items():
        if field not in rangeable:
            raise ValueError(
                f"filter_range field {field!r} not a docmap structured/"
                f"numeric field of this index; it carries: "
                f"{sorted(rangeable)} (declare numeric columns at build "
                "time via build_index(numeric_fields=...))"
            )
        try:
            lo, hi = bounds
        except (TypeError, ValueError):
            raise ValueError(
                f"filter_range[{field!r}] must be a (lo, hi) pair "
                "(either bound may be None)"
            ) from None
        fr[field] = (lo, hi)
    ft_in = spec.get("filter_term") or {}
    if not isinstance(ft_in, dict):
        raise ValueError("filter_term must be {field: value-or-list}")
    ft: dict[str, tuple] = {}
    allowed = _RANGE_FIELDS | set(keyword_fields) | set(numeric_fields)
    for field, vals in ft_in.items():
        if field not in allowed:
            raise ValueError(
                f"filter_term field {field!r} not a docmap structured/"
                f"keyword field of this index; it carries: "
                f"{sorted(allowed)} (declare keyword columns at build "
                "time via build_index(keyword_fields=...))"
            )
        if isinstance(vals, (str, bytes)) or not hasattr(vals, "__iter__"):
            vals = (vals,)
        vals = tuple(vals)
        if not vals or any(v is None for v in vals):
            raise ValueError(
                f"filter_term[{field!r}] needs >=1 non-null value (ES "
                "term/terms queries never match null — filter nulls with "
                "a DataFrame predicate over the docmap instead)"
            )
        ft[field] = vals
    fe_in = spec.get("filter_exists") or ()
    if isinstance(fe_in, str):
        fe_in = (fe_in,)
    fe: tuple = ()
    for field in fe_in:
        if field not in allowed:
            raise ValueError(
                f"filter_exists field {field!r} not a docmap structured/"
                f"keyword/numeric field of this index; it carries: "
                f"{sorted(allowed)}"
            )
        fe += (field,)
    fe = tuple(sorted(set(fe)))
    if not (s["must"] or s["should"] or s["filter"]):
        raise ValueError(
            "bool spec has no must/should/filter TERM clause: a "
            "must_not-only query is ES match_all-minus-excluded and a "
            "filter_range/filter_term-only query never touches the "
            "inverted index — both are corpus scans; express them as "
            "plain DataFrame filters over the docmap/source instead"
        )
    return fr, ft, fe


def _get_msm(spec: dict, s: dict[str, list[str]]) -> int:
    """Validated ES ``minimum_should_match``: a doc must match at least
    this many DISTINCT should terms (in addition to must/filter/must_not).
    0 keeps the defaults ES uses — with required clauses should is
    optional; pure-should already demands >=1 match by construction. A
    value above len(should) simply yields empty, like ES."""
    msm = spec.get("minimum_should_match") or 0
    if not isinstance(msm, int) or isinstance(msm, bool) or msm < 0:
        raise ValueError("minimum_should_match must be a non-negative int")
    if msm and not s["should"]:
        raise ValueError(
            "minimum_should_match requires should clauses to count"
        )
    return msm


def index_has_positions(index_dir: str) -> bool:
    """True when the committed manifest records the v2 positional layout
    (build_index(positions=True) — docs/positional-postings.md)."""
    from ..sources.catalog import read_index_manifest

    m = read_index_manifest(index_dir)
    return bool(m and m.get("positions"))


def _query_plumbing(
    spark, index_dir: str, all_terms: list[str], with_positions: bool = False
):
    """Shared driver-side setup: index state + dictionary lookup + segment
    scan pruned to the batch vocabulary. Returns None when nothing can
    match (no dictionary hits / no committed segments).

    ``with_positions=False`` prunes the v2 positional sidecar columns (if
    the index has them) so positions-free queries never ship position
    bytes through the scan/shuffle; True keeps them (positional phrase)."""
    from ..session import ship_package
    from ..sources.catalog import assert_index_readable, committed_gen_paths
    from .build import V1_SEGMENT_COLS
    from .dictionary import lookup_term_info

    ship_package(spark)
    assert_index_readable(index_dir)  # closed-index parity (wand_topk)
    n_docs, avgdl, commit_seq = _index_state(spark, index_dir)
    term_info = lookup_term_info(spark, index_dir, all_terms)
    tids = [ti[0] for ti in term_info.values()]
    seg_paths = committed_gen_paths(index_dir, "segments")
    if not tids or not seg_paths:
        return None
    segs = spark.read.parquet(*seg_paths)
    if not with_positions:
        segs = segs.select(*V1_SEGMENT_COLS)
    segs = segs.filter(F.col("term_id").isin(tids))
    idf = {
        t: math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
        for t, (_tid, df) in term_info.items()
    }
    state = {
        "fwd_path": tuple(committed_gen_paths(index_dir, "fwd")),
        "tomb_path": tuple(committed_gen_paths(index_dir, "tombstones")),
        "docmap_path": tuple(committed_gen_paths(index_dir, "docmap")),
        "seq": int(commit_seq),
        "avgdl": float(avgdl),
    }
    return segs, term_info, idf, state


def _struct_arrays(
    fr: dict, ft: dict, fe: tuple, docmap_path, seq: int
) -> list[np.ndarray]:
    """One sorted docID array per structured-filter field (range, term,
    AND exists clauses), from the byte-budgeted per-worker docfilter
    cache."""
    from osu_elastic_indexer_spark.operators.state import (
        load_docids_eq,
        load_docids_exists,
        load_docids_in_range,
    )

    arrs = []
    for field in sorted(fr):
        flo, fhi = fr[field]
        arrs.append(load_docids_in_range(docmap_path, seq, field, flo, fhi))
    for field in sorted(ft):
        arrs.append(load_docids_eq(docmap_path, seq, field, ft[field]))
    for field in fe:
        arrs.append(load_docids_exists(docmap_path, seq, field))
    return arrs


def _struct_mask_range(
    lo: int, span: int, fr: dict, ft: dict, fe: tuple, docmap_path, seq: int
) -> np.ndarray:
    """Dense boolean eligibility mask for the structured filters (AND over
    range + term fields) over the docID window [lo, lo+span), built from
    the per-worker-cached docmap scans — sized to the caller's
    accumulator range, never the corpus."""
    mask = None
    for ids in _struct_arrays(fr, ft, fe, docmap_path, seq):
        sel = ids[(ids >= lo) & (ids < lo + span)] - lo
        m = np.zeros(span, dtype=bool)
        m[sel] = True
        mask = m if mask is None else (mask & m)
    return mask


def _struct_mask(
    size: int, fr: dict, ft: dict, fe: tuple, docmap_path, seq: int
) -> np.ndarray:
    """Corpus-anchored variant (window [0, size)) of _struct_mask_range."""
    return _struct_mask_range(0, size, fr, ft, fe, docmap_path, seq)


def _struct_docids(
    fr: dict, ft: dict, fe: tuple, docmap_path, seq: int
) -> np.ndarray:
    """INTERSECTED sorted global docIDs matching every structured filter —
    the zero-score-tail enumeration source for specs whose only required
    clauses are filter context (ES: such docs are hits at score 0.0 even
    when they contain none of the query's terms)."""
    arrs = _struct_arrays(fr, ft, fe, docmap_path, seq)
    out = arrs[0]
    for a in arrs[1:]:
        out = np.intersect1d(out, a, assume_unique=True)
    return out


def _pad_zero_score(top: list, kk: int, eligible0: np.ndarray) -> list:
    """ES filter-context scoring tail: docs matching every required clause
    but no scored term rank with score 0.0 after all positive docs, doc_id
    ascending (``eligible0`` must already exclude positively-scored,
    excluded, out-of-range, and tombstoned docs)."""
    if len(top) >= kk:
        return top
    zeros = np.flatnonzero(eligible0)[: kk - len(top)]
    top.extend((0.0, int(d)) for d in zeros)
    return top


def _bool_runner(state: dict, k: int, structs: dict[int, tuple[dict, dict, tuple]]):
    """applyInPandas body for one query's segment rows (term, idf, role,
    n_must columns riding the broadcast qmap join; n_must counts REQUIRED
    clauses = must ∪ filter). ``structs``: qid -> (filter_range,
    filter_term, filter_exists) normalized filter-context restrictions."""
    fwd_path = state["fwd_path"]
    tomb_path = state["tomb_path"]
    docmap_path = state["docmap_path"]
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
        n_msm = int(pdf["n_msm"].iloc[0])
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
        # per-query accumulators sized to the query's observed docID RANGE
        # (min doc_min .. max doc_max over its segment rows), not the
        # corpus: a rare-term query allocates its term span, only a
        # head-term query approaches O(n_docs). (ADVICE r4: "size
        # accumulators to the group's doc range like score_cell does".)
        lo = int(cols["doc_min"].min())
        span = int(cols["doc_max"].max()) - lo + 1
        sums = np.zeros(span, dtype=np.float64)
        must_cnt = np.zeros(span, dtype=np.int16)
        should_cnt = np.zeros(span, dtype=np.int16) if n_msm else None
        excluded = np.zeros(span, dtype=bool)
        seen_must = 0
        # sorted-term accumulation: same left fold as taat_topk/the oracle
        for t in sorted(per_term):
            e = per_term[t]
            e["rows"].sort(key=lambda r: r[0])
            parts = [codec.decode_postings(enc) for _dm, enc in e["rows"]]
            d = np.concatenate([p[0] for p in parts])
            role = e["role"]
            dl_ = d - lo
            if role & _SCORED:
                tf = np.concatenate([p[1] for p in parts]).astype(np.float64)
                dl = norms[d].astype(np.float64)
                tfn = tf / (tf + K1 * ((1.0 - B) + (B * dl) / avgdl))
                sums[dl_] += e["idf"] * tfn
            if role & _MUST:
                must_cnt[dl_] += 1
                seen_must += 1
            if role & _SHOULD and n_msm:
                should_cnt[dl_] += 1
            if role & _MUST_NOT:
                excluded[dl_] = True
        if seen_must < n_must:
            # a required term had no segment rows (deleted-only
            # generations): nothing can match all clauses
            return empty
        st_spec = structs.get(qid)
        struct = (
            _struct_mask_range(lo, span, *st_spec, docmap_path, seq)
            if st_spec
            else None
        )
        if n_must:
            sums[must_cnt < n_must] = 0.0
        if n_msm:
            sums[should_cnt < n_msm] = 0.0
        sums[excluded] = 0.0
        if struct is not None:
            sums[~struct] = 0.0
        if tomb is not None and tomb.size:
            tt = tomb[(tomb >= lo) & (tomb < lo + span)]
            sums[tt - lo] = 0.0
        top = topk_from_dense(sums, kk)
        # zero-score tail is impossible under msm: matching a should term
        # always contributes positive score, so should_cnt >= msm >= 1
        # implies score > 0. ES treats filter CONTEXT (filter_range /
        # filter_term) as "required clauses present" too: with them the
        # msm default stays 0 and filter-matching docs are hits at 0.0
        # even when no scored term matches (ADVICE r5).
        top = [(s, d + lo) for s, d in top]  # span-relative -> global ids
        if (n_must or st_spec) and not n_msm and len(top) < kk:
            # filter-context zero-score tail (docs matching all required
            # clauses but no scored term)
            eligible0 = (must_cnt >= n_must) & ~excluded & (sums <= 0.0)
            if struct is not None:
                eligible0 &= struct
            if tomb is not None and tomb.size:
                tt = tomb[(tomb >= lo) & (tomb < lo + span)]
                eligible0[tt - lo] = False
            zeros = np.flatnonzero(eligible0) + lo
            if st_spec and not n_must:
                # no required TERM clause: the tail covers INDEXED
                # (dl > 0) filter-matching docs with no query-term
                # postings at all — both inside the span (dl guard) and
                # beyond it (enumerated from the intersected filter
                # docIDs; they carry no postings, so no must_not term
                # can exclude them)
                avail = max(0, min(norms.size - lo, span))
                nm = np.zeros(span, dtype=np.int64)
                if avail > 0:
                    nm[:avail] = norms[lo : lo + avail]
                zeros = zeros[nm[zeros - lo] > 0]
                fd = _struct_docids(*st_spec, docmap_path, seq)
                out = fd[(fd < lo) | (fd >= lo + span)]
                out = out[out < norms.size]
                out = out[norms[out] > 0]
                if tomb is not None and tomb.size:
                    out = out[~np.isin(out, tomb)]
                zeros = np.union1d(zeros, out)
            top.extend((0.0, int(d)) for d in zeros[: kk - len(top)])
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

    ``queries``: [(query_id, {"must": ..., "should": ..., "must_not": ...,
    "filter": ..., "filter_range": {field: (lo, hi)},
    "filter_term": {field: value-or-list}})] — term clause values are raw
    text or lists of texts (tokenized with the engine tokenizer);
    ``filter`` terms are required but unscored (ES filter context);
    ``filter_range`` restricts by the docmap's structured fields and
    ``filter_term`` exact-matches its declared KEYWORD fields (ES
    term/terms filter — the country_code/ruleset_id restriction,
    scores.json:17-19,32-37). Returns (query_id, rank, doc_id, score); a
    query whose required clause cannot match produces no rows; an
    unusable spec raises ValueError (``_check_spec``).
    """
    kw_fields = index_keyword_fields(index_dir)
    num_fields = index_numeric_fields(index_dir)
    specs = [(qid, _normalize_spec(s)) for qid, s in queries]
    structs = {}
    for (qid, s), (_qid2, raw) in zip(specs, queries):
        fr, ft, fe = _check_spec(raw, s, kw_fields, num_fields)
        if fr or ft or fe:
            structs[qid] = (fr, ft, fe)
    msms = {
        qid: _get_msm(raw, s)
        for (qid, s), (_qid2, raw) in zip(specs, queries)
    }
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
        required = sorted(set(s["must"]) | set(s["filter"]))
        if any(t not in term_info for t in required):
            continue  # ES semantics: unmatched required clause -> empty
        scored = sorted(set(s["must"]) | set(s["should"]))
        roles: dict[str, int] = {}
        for t in scored:
            if t in term_info:
                roles[t] = roles.get(t, 0) | _SCORED
        for t in s["should"]:
            if t in term_info:
                roles[t] = roles.get(t, 0) | _SHOULD
        for t in required:
            roles[t] = roles.get(t, 0) | _MUST
        for t in s["must_not"]:
            if t in term_info:
                roles[t] = roles.get(t, 0) | _MUST_NOT
        if not roles:
            continue
        n_required = len(required)
        boosts = s["boosts"]
        for t, role in roles.items():
            # ES per-clause boost folds into the per-(query, term) idf the
            # qmap already carries — the runner is boost-oblivious
            qmap_rows.append(
                (qid, t, term_info[t][0], idf[t] * boosts.get(t, 1.0),
                 role, n_required, msms[qid])
            )
    if not qmap_rows:
        return spark.createDataFrame([], RESULT_SCHEMA)
    qmap = spark.createDataFrame(
        qmap_rows,
        "query_id bigint, term string, term_id bigint, idf double, "
        "role int, n_must int, n_msm int",
    )
    grouped = segs.join(F.broadcast(qmap), "term_id")
    return grouped.groupBy("query_id").applyInPandas(
        _bool_runner(state, k, structs), RESULT_SCHEMA
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
    local required-count and exclusion masks are COMPLETE for every doc the
    cell owns — a doc eligible in its cell is eligible globally, and the
    union of per-cell top-ks contains the exact global top-k (cells cover
    disjoint docs; one tiny window finishes). Scores fold sorted-term like
    ``bool_topk``, so both paths are bit-identical — including the ES
    filter context (``filter`` terms, ``filter_range``, zero-score tail):
    zero-score docs rank below every positive doc globally, so per-cell
    padding to k keeps the union argument exact.

    One shape routes to the per-query path: a spec whose ONLY required
    clauses are filter context (no must/filter term, msm 0). Its ES
    zero-score tail covers filter-matching docs with NO query-term
    postings at all — docs living in cells no segment row reaches, which
    no cell task can enumerate. ``bool_topk`` computes that tail exactly
    (from the intersected filter docIDs), and both paths are
    bit-identical on every other shape, so the union stays exact.
    """
    kw_fields = index_keyword_fields(index_dir)
    num_fields = index_numeric_fields(index_dir)
    specs = [(qid, _normalize_spec(s)) for qid, s in queries]
    structs = {}
    tail_qids = set()
    for (qid, s), (_qid2, raw) in zip(specs, queries):
        fr, ft, fe = _check_spec(raw, s, kw_fields, num_fields)
        if fr or ft or fe:
            structs[qid] = (fr, ft, fe)
            if not (s["must"] or s["filter"]) and not _get_msm(raw, s):
                tail_qids.add(qid)
    if tail_qids:
        routed = bool_topk(
            spark, index_dir,
            [(q, r) for q, r in queries if q in tail_qids], k,
        )
        rest = [(q, r) for q, r in queries if q not in tail_qids]
        if not rest:
            return routed
        return routed.unionByName(
            bool_topk_docpart(spark, index_dir, rest, k)
        )
    all_terms = sorted(
        {t for _qid, s in specs for r in s.values() for t in r}
    )
    if not all_terms:
        return spark.createDataFrame([], RESULT_SCHEMA)
    plumb = _query_plumbing(spark, index_dir, all_terms)
    if plumb is None:
        return spark.createDataFrame([], RESULT_SCHEMA)
    segs, term_info, idf, state = plumb

    # tid -> [(qid, idf, role)] subscriptions + per-qid required-clause
    # counts, closure-shipped (bounded by the batch vocabulary)
    subs: dict[int, list[tuple[int, float, int]]] = {}
    n_must_by_q: dict[int, int] = {}
    n_msm_by_q: dict[int, int] = {}
    msms = {
        qid: _get_msm(raw, s)
        for (qid, s), (_qid2, raw) in zip(specs, queries)
    }
    for qid, s in specs:
        required = sorted(set(s["must"]) | set(s["filter"]))
        if any(t not in term_info for t in required):
            continue  # ES semantics: unmatched required clause -> empty
        scored = set(s["must"]) | set(s["should"])
        roles: dict[str, int] = {}
        for t in scored:
            if t in term_info:
                roles[t] = roles.get(t, 0) | _SCORED
        for t in s["should"]:
            if t in term_info:
                roles[t] = roles.get(t, 0) | _SHOULD
        for t in required:
            roles[t] = roles.get(t, 0) | _MUST
        for t in s["must_not"]:
            if t in term_info:
                roles[t] = roles.get(t, 0) | _MUST_NOT
        if not roles:
            continue
        n_must_by_q[qid] = len(required)
        n_msm_by_q[qid] = msms[qid]
        boosts = s["boosts"]
        for t, role in roles.items():
            # per-clause boost folds into the subscription idf (bool_topk)
            subs.setdefault(term_info[t][0], []).append(
                (qid, idf[t] * boosts.get(t, 1.0), role)
            )
    if not subs:
        return spark.createDataFrame([], RESULT_SCHEMA)
    tids = sorted(subs)
    segs = segs.filter(F.col("term_id").isin(tids))
    _tid_term = {ti[0]: t for t, ti in term_info.items()}
    fwd_path, tomb_path = state["fwd_path"], state["tomb_path"]
    docmap_path = state["docmap_path"]
    seq, avgdl = state["seq"], state["avgdl"]
    kk = int(k)

    def score_cell(pdf: pd.DataFrame) -> pd.DataFrame:
        from osu_elastic_indexer_spark.operators.state import (
            load_norms,
            load_tombstones,
        )

        norms = load_norms(fwd_path, seq)
        tomb = load_tombstones(tomb_path, seq)
        lo, span = _cell_bounds(pdf["doc_min"], pdf["doc_max"])
        hi = lo + span - 1
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
            n_msm = n_msm_by_q[qid]
            sums = np.zeros(span, dtype=np.float64)
            must_cnt = np.zeros(span, dtype=np.int16) if n_must else None
            should_cnt = np.zeros(span, dtype=np.int16) if n_msm else None
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
                if role & _SHOULD and n_msm:
                    should_cnt[d] += 1
                if role & _MUST_NOT:
                    if excluded is None:
                        excluded = np.zeros(span, dtype=bool)
                    excluded[d] = True
            # struct mask sized to THIS cell's span: the worker-cached
            # docID arrays are sliced to [lo, lo+span) — accumulator
            # memory stays bounded by the cell (docpart contract)
            st_spec = structs.get(qid)
            struct = (
                _struct_mask_range(lo, span, *st_spec, docmap_path, seq)
                if st_spec
                else None
            )
            if n_must:
                sums[must_cnt < n_must] = 0.0
            if n_msm:
                sums[should_cnt < n_msm] = 0.0
            if excluded is not None:
                sums[excluded] = 0.0
            if struct is not None:
                sums[~struct] = 0.0
            if tomb is not None and tomb.size:
                tt = tomb[(tomb >= lo) & (tomb <= hi)]
                if tt.size:
                    sums[tt - lo] = 0.0
            top = topk_from_dense(sums, kk)
            # (no zero-score tail under msm — a should match always scores)
            if n_must and not n_msm and len(top) < kk:
                # per-cell filter-context zero-score tail (see module doc:
                # zero docs rank below every positive doc globally, so
                # padding each cell to k keeps the union argument exact)
                eligible0 = (must_cnt >= n_must) & (sums <= 0.0)
                if excluded is not None:
                    eligible0 &= ~excluded
                if struct is not None:
                    eligible0 &= struct
                if tomb is not None and tomb.size:
                    tt = tomb[(tomb >= lo) & (tomb <= hi)]
                    if tt.size:
                        eligible0[tt - lo] = False
                top = _pad_zero_score(top, kk, eligible0)
            for s, d in top:
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
        terms = lookup_terms_by_prefix(
            index_dir, toks[0], max_expansions, spark=spark
        )
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


def _matches_occ(occ_by_slot: list, slop: int) -> bool:
    """Lucene/ES sloppy-phrase match criterion (SloppyPhraseScorer) over
    per-SLOT occurrence lists: matches iff one occurrence per slot can be
    chosen, at pairwise-DISTINCT positions, whose slop-adjusted values
    (pos - slot_index) span at most ``slop``. Both verify tiers — token
    re-tokenization (``_matches_phrase``) and the positional index path —
    route through this one function, so their semantics can never diverge.

    Cost: O(distinct adjusted values × phrase_len × window occupancy) per
    doc — phrase_len is tiny and this only ever runs on candidates."""
    m = len(occ_by_slot)
    if m == 0 or any(len(o) == 0 for o in occ_by_slot):
        return False
    if slop <= 0:
        # exact adjacency: all adjusted equal — intersect the adjusted sets
        # (positions are automatically distinct: p = lo + slot)
        common = set(int(p) for p in occ_by_slot[0])
        for s in range(1, m):
            common &= {int(p) - s for p in occ_by_slot[s]}
            if not common:
                return False
        return True
    # every feasible window [lo, lo+slop] has its min at some slot's
    # adjusted value, so enumerating those lows is exhaustive
    lows = sorted(
        {int(p) - s for s, occ in enumerate(occ_by_slot) for p in occ}
    )
    for lo in lows:
        allowed = [
            [int(p) for p in occ if lo <= int(p) - s <= lo + slop]
            for s, occ in enumerate(occ_by_slot)
        ]
        if any(not a for a in allowed):
            continue
        # injective slot -> position assignment (Kuhn augmenting paths;
        # only slots sharing a term can ever contend)
        taken: dict[int, int] = {}

        def assign(slot: int, seen: set[int]) -> bool:
            for p in allowed[slot]:
                if p in seen:
                    continue
                seen.add(p)
                if p not in taken or assign(taken[p], seen):
                    taken[p] = slot
                    return True
            return False

        if all(assign(s, set()) for s in range(m)):
            return True
    return False


def _matches_phrase(tokens: list[str], phrase: list[str], slop: int = 0) -> bool:
    """Sloppy-phrase match on a token stream: build per-slot occurrence
    lists, delegate to ``_matches_occ`` (the shared criterion). slop=0
    keeps the fast windowed scan."""
    if slop <= 0:
        return _contains_phrase(tokens, phrase)
    if not phrase:
        return False
    occ: dict[str, list[int]] = {}
    for t in phrase:
        if t not in occ:
            occ[t] = [i for i, tok in enumerate(tokens) if tok == t]
            if not occ[t]:
                return False
    return _matches_occ([occ[t] for t in phrase], slop)


def _cell_bounds(doc_min, doc_max) -> tuple[int, int]:
    """(lo, span) of one docpart cell, from its segment rows' doc ranges.
    This is THE size every per-query dense accumulator in ``score_cell``
    allocates — the docpart memory contract is that it is bounded by the
    (generation, salt) cell's docID span, never the corpus docID space
    (the per-query paths allocate O(n_docs); see wand.py TAAT note).
    Kept as a module-level helper so the layout test can measure peak
    accumulator size over a real index through the same code path."""
    lo = int(min(doc_min))
    hi = int(max(doc_max))
    return lo, hi - lo + 1


def _row_to_enc_pos(row) -> dict:
    enc = _row_to_enc(row)
    enc["pos_blob"] = bytes(row["pos_blob"])
    enc["pos_offs"] = np.asarray(row["pos_offs"], dtype=np.int64)
    return enc


def _decode_positions_selected(
    term_rows: list[tuple], eligible: np.ndarray
) -> tuple | None:
    """BLOCK-SELECTED position decode for ONE term (the Lucene-skipping
    analog): only blocks whose [first, last] docID range contains a
    candidate decode their position bytes — for a "rare common" phrase
    the common term decodes ~df(rare) blocks instead of its whole list.
    Above half a row's blocks, one whole-row decode wins (no per-block
    call overhead). ``term_rows``: ``[(enc, docs, tfs), ...]`` for the
    term's segment rows (postings already decoded); ``eligible``: sorted
    GLOBAL candidate docIDs. Returns ``(docs, tfs, positions, pstart)``
    over the selected blocks only — a candidate doc is always inside some
    selected block, so phrase verification over the partial arrays is
    complete — or None when no block holds a candidate."""
    d_parts, tf_parts, pos_parts = [], [], []
    BLK = codec.BLOCK
    for enc, d_i, tf_i in term_rows:
        bf = np.asarray(enc["block_first"], dtype=np.int64)
        bl = np.asarray(enc["block_last"], dtype=np.int64)
        nb = bf.size
        i0 = np.searchsorted(eligible, bf)
        needed = (i0 < eligible.size) & (
            eligible[np.minimum(i0, eligible.size - 1)] <= bl
        )
        n_need = int(needed.sum())
        if n_need == 0:
            continue
        if n_need > nb // 2:
            d_parts.append(d_i)
            tf_parts.append(tf_i)
            pos_parts.append(codec.decode_positions(enc["pos_blob"], tf_i))
        else:
            for b in np.flatnonzero(needed):
                sl = slice(int(b) * BLK, min((int(b) + 1) * BLK, d_i.size))
                tfb = tf_i[sl]
                d_parts.append(d_i[sl])
                tf_parts.append(tfb)
                pos_parts.append(
                    codec.decode_positions_block(enc, tfb, int(b))
                )
    if not d_parts:
        return None
    d = np.concatenate(d_parts)
    tf = np.concatenate(tf_parts)
    poss = np.concatenate(pos_parts)
    pstart = np.zeros(d.size + 1, dtype=np.int64)
    np.cumsum(tf, out=pstart[1:])
    return d, tf, poss, pstart


def _phrase_runner(state: dict, k: int, phrases_b: dict[int, list[str]],
                   slop: int, idf_by_term: dict[str, float]):
    """applyInPandas body for one phrase query's POSITIONAL segment rows:
    decode docs+tfs+positions per term, score BM25 over the unique terms
    (sorted-term fold — bit-identical to bool_topk/the source-verify
    path), keep docs containing every term, then verify the phrase on the
    decoded position arrays: a vectorized adjusted-intersection for
    slop=0, the shared ``_matches_occ`` criterion per candidate for
    slop>0. No source scan, no tokenizer — the index answers alone.

    Memory: per-query dense accumulators sized to the query's OBSERVED
    docID range (min doc_min .. max doc_max over its segment rows — the
    bool-runner envelope; only a head-term phrase approaches the corpus
    span) plus the decoded positions of the phrase's terms (∝ their
    posting volume)."""
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
        phrase = phrases_b.get(qid, [])
        uniq = sorted(set(phrase))
        if not phrase:
            return empty
        cols = {c: pdf[c].to_numpy() for c in pdf.columns}
        rows_by_term: dict[str, list] = {}
        for i in range(len(pdf)):
            rows_by_term.setdefault(cols["term"][i], []).append(
                (int(cols["doc_min"][i]),
                 _row_to_enc_pos({c: cols[c][i] for c in pdf.columns}))
            )
        if len(rows_by_term) < len(uniq):
            return empty  # a phrase term has no postings at all
        # pass 1: decode docs+tfs only, score + conjunction-count (positions
        # stay encoded until the candidate set is known). Accumulators are
        # sized to the query's observed docID RANGE, not the corpus (the
        # bool-runner envelope).
        lo = int(cols["doc_min"].min())
        acc_span = int(cols["doc_max"].max()) - lo + 1
        sums = np.zeros(acc_span, dtype=np.float64)
        must_cnt = np.zeros(acc_span, dtype=np.int16)
        term_rows: dict[str, list] = {}
        for t in uniq:  # sorted-term fold (scores == bool/source path)
            rows = rows_by_term[t]
            rows.sort(key=lambda r: r[0])
            decoded_rows = []
            for _dm, enc in rows:
                d_i, tf_i = codec.decode_postings(enc)
                decoded_rows.append((enc, d_i, tf_i))
                dl = norms[d_i].astype(np.float64)
                tfn = tf_i.astype(np.float64) / (
                    tf_i + K1 * ((1.0 - B) + (B * dl) / avgdl)
                )
                sums[d_i - lo] += idf_by_term[t] * tfn
                must_cnt[d_i - lo] += 1
            term_rows[t] = decoded_rows
        sums[must_cnt < len(uniq)] = 0.0
        if tomb is not None and tomb.size:
            tt = tomb[(tomb >= lo) & (tomb < lo + acc_span)]
            sums[tt - lo] = 0.0
        eligible = np.flatnonzero(sums > 0.0) + lo  # GLOBAL docIDs
        if eligible.size == 0:
            return empty
        # pass 2: positions, block-selected via the shared helper (also
        # the docpart cell scorer's position pass)
        decoded: dict[str, tuple] = {}
        for t in uniq:
            res = _decode_positions_selected(term_rows[t], eligible)
            if res is None:
                return empty  # every candidate block vanished (can't happen
                # for a true candidate, defensive for empty eligible overlap)
            decoded[t] = res
        # positional verification through the SAME vectorized kernel the
        # docpart cell scorer uses (_verify_positions_cell: fused-key
        # intersection for slop=0, origin-segmented anchor sweep for
        # repeat-free slop, per-doc _matches_occ fallback) — one shared
        # code path, bit-identical results on both physical shapes
        verified = _verify_positions_cell(
            phrase, decoded, eligible,
            span_hint=(int(norms.max()) if norms.size else 1), slop=slop,
        )
        if len(verified) == 0:
            return empty
        mask = np.zeros(acc_span, dtype=bool)
        mask[np.asarray(verified, dtype=np.int64) - lo] = True
        sums[~mask] = 0.0
        top = topk_from_dense(sums, kk)
        return pd.DataFrame(
            {
                "query_id": [qid] * len(top),
                "rank": list(range(1, len(top) + 1)),
                "doc_id": [dd + lo for _s, dd in top],
                "score": [s for s, _d in top],
            }
        )

    return run_query


def _keep_mask(d: np.ndarray, eligible: np.ndarray) -> np.ndarray:
    """Membership of ``d`` (posting docIDs) in ``eligible`` (sorted
    candidate docIDs) as a boolean mask — an O(range) table lookup instead
    of np.isin's sort-based path. Candidates here are dense in their own
    range (for a head-term phrase eligible ≈ every doc; in a docpart cell
    the range is cell-bounded), so the table is small and the lookup is
    one gather; np.isin re-sorted both arrays per slot."""
    if eligible.size == 0:
        return np.zeros(d.size, dtype=bool)
    lo = int(eligible[0])
    width = int(eligible[-1]) - lo + 1
    table = np.zeros(width, dtype=bool)
    table[eligible - lo] = True
    dd = d - lo
    inside = (dd >= 0) & (dd < width)
    out = np.zeros(d.size, dtype=bool)
    out[inside] = table[dd[inside]]
    return out


def _sorted_or_sort(a: np.ndarray) -> np.ndarray:
    """Return ``a`` sorted, skipping the sort when it already is — the
    fused (doc, adjusted-position) keys are built from doc-ascending
    segment rows with position-ascending runs, so they arrive sorted by
    construction; the O(n) check replaces an O(n log n) sort while staying
    safe against any future construction change."""
    if a.size > 1 and not bool(np.all(a[1:] >= a[:-1])):
        a.sort()
    return a


def _intersect_sorted_unique(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Intersection of two SORTED arrays of unique keys, by binary probe of
    the smaller into the larger — np.intersect1d re-sorts its concatenated
    input every call (O((n+m) log(n+m))); this is O(min log max)."""
    if a.size == 0 or b.size == 0:
        return np.empty(0, dtype=np.int64)
    if b.size < a.size:
        a, b = b, a
    idx = np.searchsorted(b, a)
    idx[idx == b.size] = b.size - 1
    return a[b[idx] == a]


def _unique_of_sorted(a: np.ndarray) -> np.ndarray:
    """np.unique for an already-sorted array: one neighbor-diff mask, no
    re-sort."""
    if a.size <= 1:
        return a
    return a[np.r_[True, a[1:] != a[:-1]]]


def _gather_runs_np(
    flat: np.ndarray, run_starts: np.ndarray, run_lens: np.ndarray
) -> np.ndarray:
    """Variable-length run gather (same as build._gather_runs; local copy
    keeps the query path free of the build module on executors)."""
    total = int(run_lens.sum())
    if total == 0:
        return np.empty(0, dtype=flat.dtype)
    new_prefix = np.zeros(run_lens.size, dtype=np.int64)
    np.cumsum(run_lens[:-1], out=new_prefix[1:])
    idx = np.repeat(run_starts, run_lens) + (
        np.arange(total, dtype=np.int64) - np.repeat(new_prefix, run_lens)
    )
    return flat[idx]


def _verify_per_doc(
    eligible: np.ndarray, phrase: list[str], decoded: dict, slop: int
) -> list[int]:
    """Per-candidate positional check through the shared ``_matches_occ``
    criterion — the slop path and the fused-key-overflow fallback."""
    out = []
    for doc in eligible:
        occ = []
        for s, t in enumerate(phrase):
            d, _tf, poss, pstart = decoded[t]
            j = int(np.searchsorted(d, doc))
            occ.append(poss[pstart[j] : pstart[j + 1]])
        if _matches_occ(occ, slop):
            out.append(int(doc))
    return out


def _verify_positions_cell(
    phrase: list[str],
    decoded: dict,
    eligible: np.ndarray,
    span_hint: int,
    slop: int,
) -> np.ndarray:
    """Positional verification over CELL-LOCAL doc ids: the same fused-key
    vectorizations as the per-query runner (exact intersection for slop=0,
    anchor-window sweep for repeat-free slop), with the per-doc _matches_occ
    fallback. ``decoded``: term -> (docs, tfs, poss, pstart); ``eligible``:
    sorted candidate doc ids (cell-local); ``span_hint``: > max position +
    len(phrase) + slop. Returns the verified doc ids (sorted)."""
    m = len(phrase)
    span = int(span_hint) + m + slop + 2
    max_doc = int(eligible[-1]) if eligible.size else 0
    fits = (max_doc + 1) * span < 2**62
    no_repeats = len(set(phrase)) == m

    def slot_fused(s: int, t: str) -> np.ndarray:
        d, tf, poss, pstart = decoded[t]
        keep = _keep_mask(d, eligible)
        if keep.all():
            # head-term phrases: every posting doc is a candidate — the
            # runs tile ``poss`` in order, so the gather is the identity
            dpp = np.repeat(d, tf)
            pp = poss
        else:
            dpp = np.repeat(d[keep], tf[keep])
            pp = _gather_runs_np(poss, pstart[:-1][keep], tf[keep])
        return _sorted_or_sort(dpp * np.int64(span) + (pp - s + m))

    if fits and slop <= 0:
        common = None
        for s, t in enumerate(phrase):
            fused = slot_fused(s, t)
            common = (
                fused
                if common is None
                else _intersect_sorted_unique(common, fused)
            )
            if common.size == 0:
                return np.empty(0, dtype=np.int64)
        return _unique_of_sorted(common // np.int64(span))
    if fits and no_repeats:
        slot_keys = [slot_fused(s, t) for s, t in enumerate(phrase)]
        # anchor sweep, segmented by the anchor's ORIGIN slot: an anchor
        # trivially covers its own slot (the key itself is in the window),
        # so each origin segment probes only the OTHER slots — and no
        # global anchor sort/dedupe is needed (a duplicated anchor only
        # repeats a check; survivors are deduped at the end)
        good_parts = []
        for s2, anchors in enumerate(slot_keys):
            if anchors.size == 0:
                continue
            ok = np.ones(anchors.size, dtype=bool)
            for s, fused in enumerate(slot_keys):
                if s == s2:
                    continue
                idx = np.searchsorted(fused, anchors, side="left")
                hit = idx < fused.size
                val = np.empty(anchors.size, dtype=np.int64)
                val[hit] = fused[idx[hit]]
                ok &= hit & (val <= anchors + slop)
                if not ok.any():
                    break
            else:
                good_parts.append(anchors[ok])
        if not good_parts:
            return np.empty(0, dtype=np.int64)
        good = np.concatenate(good_parts)
        if good.size == 0:
            return np.empty(0, dtype=np.int64)
        return np.unique(good // np.int64(span))
    return np.asarray(
        _verify_per_doc(eligible, phrase, decoded, slop), dtype=np.int64
    )


def phrase_topk_positional_docpart(
    spark: SparkSession,
    index_dir: str,
    queries: list[tuple[int, str]],
    k: int = 10,
    slop: int = 0,
) -> DataFrame:
    """DOCUMENT-partitioned positional phrase batch: the bool_topk_docpart
    shape — segment rows (WITH the pos sidecar) shuffle once per
    (generation, salt) docID cell regardless of the query count, and each
    cell scores + position-verifies its own docs. Correct per cell by the
    salted-grid construction: a doc's postings AND positions for every
    term live wholly inside its cell, so cell-local verification is
    complete, every verified doc scores positive (all phrase terms are
    scored), and the union of per-cell top-ks contains the global top-k.
    Scores keep the sorted-term fold — bit-identical to the per-query
    positional path and the source-verify path.

    This is also how head-term slop phrases parallelize: the per-query
    runner verifies one query in one task, while each cell here verifies
    its own docID range concurrently."""
    phrases = {int(qid): tokenize(text) for qid, text in queries}
    all_terms = sorted({t for ph in phrases.values() for t in ph})
    if not all_terms:
        return spark.createDataFrame([], RESULT_SCHEMA)
    plumb = _query_plumbing(spark, index_dir, all_terms, with_positions=True)
    if plumb is None:
        return spark.createDataFrame([], RESULT_SCHEMA)
    segs, term_info, idf, state = plumb
    subs: dict[int, list[tuple[int, float]]] = {}
    live_phrases: dict[int, list[str]] = {}
    for qid, ph in phrases.items():
        if not ph or any(t not in term_info for t in set(ph)):
            continue
        live_phrases[qid] = ph
        for t in sorted(set(ph)):
            subs.setdefault(term_info[t][0], []).append((qid, idf[t]))
    if not subs:
        return spark.createDataFrame([], RESULT_SCHEMA)
    tids = sorted(subs)
    segs = segs.filter(F.col("term_id").isin(tids))
    _tid_term = {ti[0]: t for t, ti in term_info.items()}
    fwd_path, tomb_path = state["fwd_path"], state["tomb_path"]
    seq, avgdl = state["seq"], state["avgdl"]
    kk = int(k)
    slop_b = int(slop)

    def score_cell(pdf: pd.DataFrame) -> pd.DataFrame:
        from osu_elastic_indexer_spark.operators.state import (
            load_norms,
            load_tombstones,
        )

        norms = load_norms(fwd_path, seq)
        tomb = load_tombstones(tomb_path, seq)
        lo, span = _cell_bounds(pdf["doc_min"], pdf["doc_max"])
        hi = lo + span - 1
        cols = {c: pdf[c].to_numpy() for c in pdf.columns}
        rows_by_tid: dict[int, list] = {}
        for i in range(len(pdf)):
            rows_by_tid.setdefault(int(cols["term_id"][i]), []).append(
                (int(cols["doc_min"][i]),
                 _row_to_enc_pos({c: cols[c][i] for c in pdf.columns}))
            )
        # pass 1: POSTINGS only, once per term in this cell — CELL-LOCAL
        # doc ids + tfn for scoring; the enc rows stay for the later
        # block-selected position pass (positions stay encoded until the
        # candidate set is known, same as the per-query runner)
        term_rows: dict[str, list] = {}
        score_data: dict[str, tuple] = {}
        for tid, rows in rows_by_tid.items():
            rows.sort(key=lambda e: e[0])
            parts = []
            for _dm, enc in rows:
                d_i, tf_i = codec.decode_postings(enc)
                parts.append((enc, d_i, tf_i))
            d = np.concatenate([p[1] for p in parts])
            tf = np.concatenate([p[2] for p in parts])
            dl = norms[d].astype(np.float64)
            tfn = tf.astype(np.float64) / (
                tf + K1 * ((1.0 - B) + (B * dl) / avgdl)
            )
            term_rows[_tid_term[tid]] = parts
            score_data[_tid_term[tid]] = (d - lo, tfn)
        # score every query first, keeping only SPARSE candidates (docIDs
        # + their scores), so the position pass below can decode each
        # term's candidate-bearing blocks ONCE for the union of all its
        # queries' candidates. One dense accumulator pair lives at a time.
        cand: dict[int, tuple] = {}
        need: dict[str, list] = {}
        for qid, phrase in live_phrases.items():
            uniq = sorted(set(phrase))
            if any(t not in score_data for t in uniq):
                continue  # term absent from this cell -> no cell matches
            sums = np.zeros(span, dtype=np.float64)
            cnt = np.zeros(span, dtype=np.int16)
            for t in uniq:  # sorted-term fold (bit-identical scores)
                d, tfn = score_data[t]
                sums[d] += idf[t] * tfn
                cnt[d] += 1
            sums[cnt < len(uniq)] = 0.0
            if tomb is not None and tomb.size:
                tt = tomb[(tomb >= lo) & (tomb <= hi)]
                if tt.size:
                    sums[tt - lo] = 0.0
            eligible = np.flatnonzero(sums > 0.0)
            if eligible.size == 0:
                continue
            cand[qid] = (eligible, sums[eligible])
            for t in uniq:
                need.setdefault(t, []).append(eligible)
        # pass 2: positions, BLOCK-SELECTED per term over the union of its
        # queries' candidates (the Lucene-skipping analog — a head-term
        # batch still decodes most blocks, but a cell serving only rare
        # phrases touches ~candidate-count blocks of a head term's sidecar)
        decoded_pos: dict[str, tuple] = {}
        max_pos = 0
        for t, parts_el in need.items():
            union_g = np.unique(np.concatenate(parts_el)) + lo
            res = _decode_positions_selected(term_rows[t], union_g)
            if res is None:
                continue  # defensive: candidates always live in a block
            d, tf, poss, pstart = res
            if poss.size:
                max_pos = max(max_pos, int(poss.max()))
            decoded_pos[t] = (d - lo, tf, poss, pstart)
        out_q, out_d, out_s = [], [], []
        for qid, (eligible, scores) in cand.items():
            phrase = live_phrases[qid]
            if any(t not in decoded_pos for t in set(phrase)):
                continue
            verified = _verify_positions_cell(
                phrase, decoded_pos, eligible, max_pos + 1, slop_b
            )
            if verified.size == 0:
                continue
            # scores for the verified docs, from the sparse candidate set
            vs = scores[np.searchsorted(eligible, verified)]
            for j in np.argsort(-vs, kind="stable")[:kk]:
                out_q.append(qid)
                out_d.append(int(verified[j]) + lo)
                out_s.append(float(vs[j]))
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


def _phrase_topk_positional(
    spark: SparkSession,
    index_dir: str,
    queries: list[tuple[int, str]],
    k: int,
    slop: int,
) -> DataFrame:
    """Index-side phrase top-k over a POSITIONAL (v2) index: one
    applyInPandas pass per query group decodes postings+positions, scores,
    and verifies — no source table, no rewrite guard needed (work is
    ∝ the phrase terms' posting volume, the same bound Lucene pays)."""
    phrases = {int(qid): tokenize(text) for qid, text in queries}
    all_terms = sorted({t for ph in phrases.values() for t in ph})
    if not all_terms:
        return spark.createDataFrame([], RESULT_SCHEMA)
    plumb = _query_plumbing(spark, index_dir, all_terms, with_positions=True)
    if plumb is None:
        return spark.createDataFrame([], RESULT_SCHEMA)
    segs, term_info, idf, state = plumb
    qmap_rows = []
    for qid, ph in phrases.items():
        if not ph or any(t not in term_info for t in set(ph)):
            continue  # a missing term can never match the conjunction
        for t in sorted(set(ph)):
            qmap_rows.append((qid, t, term_info[t][0]))
    if not qmap_rows:
        return spark.createDataFrame([], RESULT_SCHEMA)
    qmap = spark.createDataFrame(
        qmap_rows, "query_id bigint, term string, term_id bigint"
    )
    grouped = segs.join(F.broadcast(qmap), "term_id")
    return grouped.groupBy("query_id").applyInPandas(
        _phrase_runner(state, k, phrases, slop, idf), RESULT_SCHEMA
    )


def match_phrase_prefix_topk(
    spark: SparkSession,
    index_dir: str,
    queries: list[tuple[int, str]],
    k: int = 10,
    max_expansions: int = 50,
) -> DataFrame:
    """ES ``match_phrase_prefix`` — the autocomplete query: the LAST token
    is a prefix, every earlier token an exact phrase slot; a doc matches
    when the full tokens appear adjacently followed by ANY dictionary
    expansion of the prefix (term-asc, capped at ``max_expansions`` —
    ES's rewrite cap). Requires the POSITIONAL (v2) layout: adjacency is
    answered from the index alone, like ``phrase_topk``'s positional
    route (Lucene runs this as MultiPhrasePrefixQuery over positions the
    same way).

    Scoring (documented engine semantics, oracle-expressible): BM25 over
    the full tokens PLUS every capped expansion the doc contains —
    sorted-term fold over that union, i.e. exactly a bool query on
    (full ∪ present expansions), with eligibility = the positional
    adjacency above. A single-token query (prefix only) degenerates to
    the ES prefix query with an any-occurrence match, scored the same
    scoring_boolean way.

    Per-query one-task execution like ``_phrase_topk_positional``;
    positions decode BLOCK-SELECTED for candidates only."""
    from ..sources.catalog import assert_index_readable
    from .dictionary import lookup_terms_by_prefix

    assert_index_readable(index_dir)
    if not index_has_positions(index_dir):
        raise ValueError(
            "match_phrase_prefix needs a POSITIONAL index "
            "(build_index(positions=True)) — the v1 layout cannot verify "
            "adjacency index-side"
        )
    plans: dict[int, tuple[list[str], list[str]]] = {}
    for qid, text in queries:
        toks = tokenize(text)
        if not toks:
            continue
        full, prefix = toks[:-1], toks[-1]
        exps = lookup_terms_by_prefix(
            index_dir, prefix, max_expansions, spark=spark
        )
        if not exps:
            continue  # no live expansion -> no match (ES: empty)
        plans[int(qid)] = (full, exps)
    if not plans:
        return spark.createDataFrame([], RESULT_SCHEMA)
    all_terms = sorted(
        {t for full, exps in plans.values() for t in full}
        | {t for _full, exps in plans.values() for t in exps}
    )
    plumb = _query_plumbing(spark, index_dir, all_terms, with_positions=True)
    if plumb is None:
        return spark.createDataFrame([], RESULT_SCHEMA)
    segs, term_info, idf, state = plumb
    qmap_rows = []
    live: dict[int, tuple[list[str], list[str]]] = {}
    for qid, (full, exps) in plans.items():
        if any(t not in term_info for t in set(full)):
            continue  # a full slot term absent -> adjacency impossible
        exps_live = [t for t in exps if t in term_info]
        if not exps_live:
            continue
        live[qid] = (full, exps_live)
        for t in sorted(set(full) | set(exps_live)):
            qmap_rows.append((qid, t, term_info[t][0]))
    if not qmap_rows:
        return spark.createDataFrame([], RESULT_SCHEMA)
    qmap = spark.createDataFrame(
        qmap_rows, "query_id bigint, term string, term_id bigint"
    )
    grouped = segs.join(F.broadcast(qmap), "term_id")
    return grouped.groupBy("query_id").applyInPandas(
        _mpp_runner(state, k, live, idf), RESULT_SCHEMA
    )


def _mpp_runner(state: dict, k: int,
                plans_b: dict[int, tuple[list[str], list[str]]],
                idf_by_term: dict[str, float]):
    """applyInPandas body for one match_phrase_prefix query's POSITIONAL
    segment rows. Pass 1 scores on postings only (full tokens ∪ present
    expansions, sorted-term fold) and masks eligibility = every full slot
    present AND >=1 expansion; pass 2 block-select-decodes positions for
    candidates and verifies exact adjacency with the LAST slot's
    positions pooled over the expansions (MultiPhrasePrefix semantics)."""
    fwd_path, tomb_path = state["fwd_path"], state["tomb_path"]
    seq, avgdl = state["seq"], state["avgdl"]
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
        full, exps = plans_b.get(qid, ([], []))
        exp_set = set(exps)
        uniq_full = sorted(set(full))
        cols = {c: pdf[c].to_numpy() for c in pdf.columns}
        rows_by_term: dict[str, list] = {}
        for i in range(len(pdf)):
            rows_by_term.setdefault(cols["term"][i], []).append(
                (int(cols["doc_min"][i]),
                 _row_to_enc_pos({c: cols[c][i] for c in pdf.columns}))
            )
        if any(t not in rows_by_term for t in uniq_full):
            return empty
        present_exps = sorted(t for t in exp_set if t in rows_by_term)
        if not present_exps:
            return empty
        lo = int(cols["doc_min"].min())
        acc_span = int(cols["doc_max"].max()) - lo + 1
        sums = np.zeros(acc_span, dtype=np.float64)
        full_cnt = np.zeros(acc_span, dtype=np.int16)
        exp_mask = np.zeros(acc_span, dtype=bool)
        term_rows: dict[str, list] = {}
        # sorted fold over ALL scored terms (full ∪ present expansions) —
        # the oracle's SUM(contrib ORDER BY term)
        for t in sorted(set(uniq_full) | set(present_exps)):
            rows = rows_by_term[t]
            rows.sort(key=lambda r: r[0])
            decoded_rows = []
            for _dm, enc in rows:
                d_i, tf_i = codec.decode_postings(enc)
                decoded_rows.append((enc, d_i, tf_i))
                dl = norms[d_i].astype(np.float64)
                tfn = tf_i.astype(np.float64) / (
                    tf_i + K1 * ((1.0 - B) + (B * dl) / avgdl)
                )
                sums[d_i - lo] += idf_by_term[t] * tfn
                if t in exp_set:
                    exp_mask[d_i - lo] = True
                if t in uniq_full:
                    full_cnt[d_i - lo] += 1
            term_rows[t] = decoded_rows
        elig = exp_mask
        if uniq_full:
            elig = elig & (full_cnt >= len(uniq_full))
        sums[~elig] = 0.0
        if tomb is not None and tomb.size:
            tt = tomb[(tomb >= lo) & (tomb < lo + acc_span)]
            sums[tt - lo] = 0.0
        eligible = np.flatnonzero(sums > 0.0) + lo  # GLOBAL docIDs
        if eligible.size == 0:
            return empty
        m = len(full) + 1
        if full:
            # pass 2: block-selected positions; last slot pools expansions
            decoded: dict[str, tuple] = {}
            for t in sorted(set(full)) + present_exps:
                res = _decode_positions_selected(term_rows[t], eligible)
                if res is None:
                    if t in exp_set:
                        continue  # this expansion has no candidate blocks
                    return empty
                decoded[t] = res
            span = (int(norms.max()) if norms.size else 1) + m + 2
            if int(norms.size) * span < 2**62:
                common = None
                for s, t in enumerate(full):
                    d, tf, poss, pstart = decoded[t]
                    keep = np.isin(d, eligible)
                    dpp = np.repeat(d[keep], tf[keep])
                    pp = _gather_runs_np(poss, pstart[:-1][keep], tf[keep])
                    fused = dpp * np.int64(span) + (pp - s + m)
                    common = (
                        fused if common is None
                        else np.intersect1d(common, fused)
                    )
                    if common.size == 0:
                        return empty
                last_parts = []
                for t in present_exps:
                    if t not in decoded:
                        continue
                    d, tf, poss, pstart = decoded[t]
                    keep = np.isin(d, eligible)
                    dpp = np.repeat(d[keep], tf[keep])
                    pp = _gather_runs_np(poss, pstart[:-1][keep], tf[keep])
                    last_parts.append(
                        dpp * np.int64(span) + (pp - (m - 1) + m)
                    )
                if not last_parts:
                    return empty
                fused_last = np.unique(np.concatenate(last_parts))
                common = np.intersect1d(common, fused_last)
                if common.size == 0:
                    return empty
                verified = np.unique(common // np.int64(span))
            else:  # fused-key overflow: per-doc pooled-occurrence check
                verified = []
                for doc in eligible:
                    occ = []
                    ok = True
                    for s, t in enumerate(full):
                        d, _tf, poss, pstart = decoded[t]
                        j = int(np.searchsorted(d, doc))
                        occ.append(poss[pstart[j]:pstart[j + 1]])
                    pool: list[int] = []
                    for t in present_exps:
                        if t not in decoded:
                            continue
                        d, _tf, poss, pstart = decoded[t]
                        j = int(np.searchsorted(d, doc))
                        if j < d.size and d[j] == doc:
                            pool.extend(poss[pstart[j]:pstart[j + 1]])
                    occ.append(np.asarray(sorted(pool), dtype=np.int64))
                    if _matches_occ(occ, 0):
                        verified.append(int(doc))
                verified = np.asarray(verified, dtype=np.int64)
            if verified.size == 0:
                return empty
        else:
            verified = eligible  # prefix-only query: any occurrence
        vs = sums[verified - lo]
        order = np.argsort(-vs, kind="stable")[:kk]
        return pd.DataFrame(
            {
                "query_id": [qid] * len(order),
                "rank": list(range(1, len(order) + 1)),
                "doc_id": [int(verified[i]) for i in order],
                "score": [float(vs[i]) for i in order],
            }
        )

    return run_query


PHRASE_MAX_CANDIDATES = 1_000_000
# auto-routing (docpart='auto'): a positional phrase whose terms' summed
# document frequency exceeds this runs on the cell-parallel docpart path —
# the per-query runner decodes ALL of those terms' postings+positions in
# ONE task, so head-term phrases ("the and") serialize there while docpart
# splits the same work across (generation, salt) cells, whose count grows
# with the corpus. Both paths are bit-identical, so routing is purely a
# physical-plan choice (Catalyst-style: same logical query, cheaper shape).
PHRASE_DOCPART_DF_SUM = 100_000


def phrase_topk(
    spark: SparkSession,
    index_dir: str,
    source: DataFrame | None,
    queries: list[tuple[int, str]],
    k: int = 10,
    docpart: bool | str = "auto",
    max_candidates: int = PHRASE_MAX_CANDIDATES,
    on_overflow: str = "error",
    slop: int = 0,
    use_positions: str = "auto",
) -> DataFrame:
    """Batched exact phrase top-k (match-then-verify; module doc).

    ``slop`` (default 0 = exact adjacency) relaxes the verify exactly like
    ES ``match_phrase``'s slop parameter: see ``_matches_phrase`` for the
    Lucene span-of-adjusted-positions criterion (transposition costs 2).
    Candidate generation is slop-independent — candidates are always the
    conjunctive term match — so only the verify predicate changes.

    ``docpart`` (positional indexes): ``'auto'`` (default) routes each
    query by its terms' summed df — above ``PHRASE_DOCPART_DF_SUM`` the
    cell-parallel ``phrase_topk_positional_docpart`` shape runs it (one
    task per docID cell instead of one task per query); ``True``/``False``
    force a path. All three produce bit-identical results.

    ``source``: the corpus table with (url, html) — the same rows the index
    was built from (the reference keeps _source outside ES and re-reads by
    PK; scores.json:3-5). Verification re-extracts text from html with the
    SAME extract+tokenize the build used (build.py's byte-identity
    invariant), so the adjacency check runs on exactly the indexed token
    stream. Returns (query_id, rank, doc_id, score) where doc_id is the
    INDEX docID (join docmap for urls) and score is BM25 over the phrase's
    unique terms, bit-identical to a plain query on them.

    Plan discipline: candidates are materialized (persist + count) and
    BROADCAST-pinned into both verify joins, so the docmap and — critically
    — the SOURCE scan never shuffle: at 100 TB a sort-merge fallback would
    exchange the full (url, html) corpus to verify a handful of docs. The
    pin is safe because the candidate count is BOUNDED first: a phrase of
    head terms ("the of") has candidates ≈ N, which no positions-free
    verify should attempt — above ``max_candidates`` the call raises
    ValueError (``on_overflow='error'``, ES's rewrite-guard analog; a
    positional index is the real fix for such phrases) or, with
    ``on_overflow='scan'``, falls back to an explicitly-chosen unpinned
    corpus-scan join (documented cost: one full source shuffle).
    """
    if on_overflow not in ("error", "scan"):
        raise ValueError("on_overflow must be 'error' or 'scan'")
    if slop < 0:
        raise ValueError("slop must be >= 0")
    if use_positions not in ("auto", "never", "require"):
        raise ValueError("use_positions must be 'auto', 'never', or 'require'")
    if docpart not in (True, False, "auto"):
        raise ValueError("docpart must be True, False, or 'auto'")
    # positional (v2) route: the index answers phrases alone — no source
    # scan, no candidate guard (work ∝ the phrase terms' posting volume);
    # docpart routes to the cell-parallel shape. 'auto' (default) splits
    # the batch by the terms' summed df — a driver-side pyarrow dictionary
    # seek, no Spark job — so head-term phrases land on docpart without
    # the caller knowing the corpus statistics (PHRASE_DOCPART_DF_SUM).
    if use_positions != "never" and index_has_positions(index_dir):
        if docpart == "auto":
            from .dictionary import lookup_term_info

            phs = {int(qid): set(tokenize(text)) for qid, text in queries}
            ti = lookup_term_info(
                spark, index_dir, sorted({t for s in phs.values() for t in s})
            )
            heavy = {
                qid
                for qid, terms in phs.items()
                if terms
                and all(t in ti for t in terms)
                and sum(ti[t][1] for t in terms) > PHRASE_DOCPART_DF_SUM
            }
            parts = []
            if heavy:
                parts.append(phrase_topk_positional_docpart(
                    spark, index_dir,
                    [(q, t) for q, t in queries if int(q) in heavy], k, slop,
                ))
            light = [(q, t) for q, t in queries if int(q) not in heavy]
            if light or not parts:
                parts.append(_phrase_topk_positional(
                    spark, index_dir, light, k, slop
                ))
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
            return out
        if docpart:
            return phrase_topk_positional_docpart(
                spark, index_dir, queries, k, slop
            )
        return _phrase_topk_positional(spark, index_dir, queries, k, slop)
    if use_positions == "require":
        raise ValueError(
            "use_positions='require' needs a positional index "
            "(build_index(positions=True))"
        )
    if source is None:
        raise ValueError(
            "phrase_topk needs the source table for verification on a "
            "positions-free index (or build with positions=True)"
        )
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
    # ('auto' means per-query here: the source-verify guard already refuses
    # head-term phrases, so candidates are few and per-query joins win)
    gen = bool_topk_docpart if docpart is True else bool_topk
    cands = gen(spark, index_dir, bool_queries, k=2**31 - 1)
    # bound before pinning: the count also materializes the cache both
    # verify joins reuse (one candidate job, not two)
    cands = cands.persist()
    n_cands = cands.count()
    if n_cands > max_candidates:
        if on_overflow == "error":
            cands.unpersist()
            raise ValueError(
                f"phrase verify would check {n_cands} candidate docs "
                f"(> max_candidates={max_candidates}): the phrase's terms "
                "are too frequent for a positions-free match-then-verify "
                "(ES rewrite-guard analog). Raise max_candidates, pass "
                "on_overflow='scan' to accept a full corpus-scan join, or "
                "index positions"
            )
        pin = lambda df: df  # documented corpus-scan mode: no broadcast pin
    else:
        pin = F.broadcast

    # phase 2: verify adjacency against the source text. candidates ->
    # docmap(url) -> source(text); candidates are the pinned small side of
    # BOTH joins (docmap and source stream, never exchange).
    from ..sources.catalog import committed_gen_paths

    docmap = spark.read.parquet(*committed_gen_paths(index_dir, "docmap"))
    cd = pin(cands).join(docmap.select("doc_id", "url"), "doc_id")
    joined = (
        pin(cd)
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
                _matches_phrase(
                    tokenize(extract_text(h)), phrases_b.get(int(q), []), slop
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
