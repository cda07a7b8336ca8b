"""Single-node serving tier: millisecond BM25 top-k over a built index.

The reference serves queries from Elasticsearch — a long-lived process with
the index hot. The Spark jobs in operators/wand.py are the BATCH query path
(thousands of queries per job); interactive p50 latency is a serving
concern, so this module reads the SAME segment/dictionary/stats parquet
directly with pyarrow (predicate pushdown -> row-group pruning — the layout
was written term_id-sorted for exactly this) and runs the identical
BMW/TAAT cores. No Spark session involved; results are rank-identical to
the Spark path by construction (same files, same scoring code).

At real scale this is the searcher fleet next to the object store; each
query touches only the row groups covering its terms.
"""

from __future__ import annotations

import math
import os

import numpy as np
import pyarrow.dataset as ds
import pyarrow.parquet as pq

from ..config import DEFAULT
from ..functions.textprep import tokenize
from .wand import TAAT_MAX_POSTINGS, bmw_topk, taat_topk

_SEG_COLS = [
    "term_id", "doc_min", "n_docs", "docs_blob", "tfs_blob",
    "doc_offs", "tf_offs", "block_first", "block_last",
    "block_max_tf", "block_min_dl",
]


class LocalSearcher:
    """Loads small index state once; serves top-k queries in milliseconds."""

    def __init__(self, index_dir: str):
        from ..sources.catalog import (
            FORMAT_VERSION,
            committed_gen_paths,
            read_index_manifest,
            resolve_table_dir,
        )

        self.index_dir = index_dir
        m = read_index_manifest(index_dir)
        if m is not None and m.get("format") != FORMAT_VERSION:
            raise RuntimeError(
                f"index at {index_dir} has on-disk format {m.get('format')}, "
                f"searcher expects {FORMAT_VERSION} — rebuild the index"
            )
        st = pq.read_table(resolve_table_dir(index_dir, "stats")).to_pylist()[0]
        self.n_docs = int(st["n_docs"])
        self.avgdl = float(st["avgdl"])
        # term -> (term_id, df): lazy row-group-pruned lookups on the
        # term-SORTED dict_by_term projection when the index has one (the
        # Lucene term-dictionary-seek analog — a searcher never holds 10^8
        # terms in a python dict); resolved terms are memoized. Indexes
        # without the projection fall back to one eager full load.
        bt = resolve_table_dir(index_dir, "dict_by_term")
        self._dict: dict[str, tuple[int, int]] = {}
        self._dict_ds = ds.dataset(bt) if os.path.isdir(bt) else None
        if self._dict_ds is None:
            d = pq.read_table(
                resolve_table_dir(index_dir, "dictionary"),
                columns=["term", "term_id", "df"],
            )
            self._dict = dict(
                zip(
                    d.column("term").to_pylist(),
                    zip(
                        d.column("term_id").to_pylist(),
                        d.column("df").to_pylist(),
                    ),
                )
            )
        # norms + tombstones via the shared executor-side loaders (sorted
        # int64 arrays; the Lucene live-docs/norms analog a searcher keeps
        # hot) — committed snapshot paths, keyed by the manifest's monotonic
        # commit_seq
        from .state import _parquet_files, load_norms, load_tombstones
        from .wand import manifest_commit_seq

        seq = manifest_commit_seq(index_dir)
        self.norms = load_norms(tuple(committed_gen_paths(index_dir, "fwd")), seq)
        self.tombstones = load_tombstones(
            tuple(committed_gen_paths(index_dir, "tombstones")), seq
        )
        # empty-corpus / all-deleted indexes commit with zero segment files;
        # pyarrow raises on an empty file list, so serve empty results instead
        seg_files = _parquet_files(tuple(committed_gen_paths(index_dir, "segments")))
        self._segments = ds.dataset(seg_files) if seg_files else None

    def _load_term_rows(self, term_ids: list[int]) -> dict[int, list[dict]]:
        if self._segments is None:
            return {}
        tbl = self._segments.to_table(
            columns=_SEG_COLS, filter=ds.field("term_id").isin(term_ids)
        )
        rows: dict[int, list[dict]] = {}
        cols = {c: tbl.column(c) for c in _SEG_COLS}
        for i in range(tbl.num_rows):
            enc = {
                "docs_blob": cols["docs_blob"][i].as_py(),
                "tfs_blob": cols["tfs_blob"][i].as_py(),
                "doc_offs": np.asarray(cols["doc_offs"][i].as_py(), np.int64),
                "tf_offs": np.asarray(cols["tf_offs"][i].as_py(), np.int64),
                "block_first": np.asarray(cols["block_first"][i].as_py(), np.int64),
                "block_last": np.asarray(cols["block_last"][i].as_py(), np.int64),
                "block_max_tf": np.asarray(cols["block_max_tf"][i].as_py(), np.int64),
                "block_min_dl": np.asarray(cols["block_min_dl"][i].as_py(), np.int64),
                "doc_min": int(cols["doc_min"][i].as_py()),
                "n_docs": int(cols["n_docs"][i].as_py()),
            }
            rows.setdefault(int(cols["term_id"][i].as_py()), []).append(enc)
        for lst in rows.values():
            lst.sort(key=lambda e: e["doc_min"])
        return rows

    def _resolve_terms(self, terms: list[str]) -> None:
        """Memoize term -> (term_id, df) for unseen terms via ONE pruned
        read of the term-sorted projection (no-op without it: the fallback
        eagerly loaded everything). Misses are memoized as absent so a hot
        OOV term never re-reads."""
        if self._dict_ds is None:
            return
        miss = [t for t in terms if t not in self._dict]
        if not miss:
            return
        tbl = self._dict_ds.to_table(
            columns=["term", "term_id", "df"],
            filter=ds.field("term").isin(miss),
        )
        found = dict(
            zip(
                tbl.column("term").to_pylist(),
                zip(
                    tbl.column("term_id").to_pylist(),
                    tbl.column("df").to_pylist(),
                ),
            )
        )
        for t in miss:
            self._dict[t] = found.get(t)

    def search(self, query_text: str, k: int = 10) -> list[tuple[int, float]]:
        """-> [(doc_id, score)] — rank-identical to oracle and Spark paths."""
        terms = sorted(set(tokenize(query_text)))
        self._resolve_terms(terms)
        infos = [
            (t, self._dict[t]) for t in terms if self._dict.get(t) is not None
        ]
        if not infos:
            return []
        rows = self._load_term_rows([tid for _t, (tid, _df) in infos])
        entries = []
        total = 0
        for t, (tid, df) in infos:
            idf = math.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5))
            encs = rows.get(tid, [])
            total += sum(e["n_docs"] for e in encs)
            entries.append((t, idf, encs))
        fn = taat_topk if total <= TAAT_MAX_POSTINGS else bmw_topk
        return [
            (doc, score)
            for score, doc in fn(
                entries, k, self.avgdl, self.norms, self.tombstones
            )
        ]


def searcher_for_catalog(root: str, alias: str = "documents") -> LocalSearcher:
    """Open the CURRENT index (the alias pointer) for serving.

    Resolves the directory via Catalog naming ({prefix}{alias}_{schema}) so
    multiple aliases sharing one catalog root open THEIR index, never another
    alias's index that happens to share the schema version string."""
    from ..sources.catalog import Catalog

    cat = Catalog(root, alias=alias)
    current = cat.get_current_schema()
    assert current, "no current schema (alias not pointed)"
    idx_dir = cat.index_dir(current)
    if not os.path.exists(os.path.join(idx_dir, "manifest.json")):
        raise FileNotFoundError(
            f"no index dir {idx_dir} for schema {current} under {root}"
        )
    return LocalSearcher(idx_dir)
