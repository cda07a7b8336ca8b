"""Posting-list compression: delta-gap + varbyte, with per-block max-score.

The reference delegates this entirely to Lucene (Elasticsearch stores the
postings); we build it from scratch per BASELINE.json north_star:
"delta-gap varbyte/PForDelta-compressed postings with per-block max-score
metadata". numpy-vectorized — these run inside applyInPandas groups on the
executors, never per-row Python.

Layout of one encoded posting list for a term:
  doc_ids: sorted ascending -> delta gaps (first = doc_id[0]+1 so every
           value is >=1) -> varbyte
  tfs:     varbyte as-is (tf >= 1)
  blocks:  fixed BLOCK docs per block; per block we keep
           (first_doc, last_doc, byte offsets, max "score hint" tf/(tf+C))
           enabling block-max WAND skipping without decoding.
"""

from __future__ import annotations

import numpy as np

BLOCK = 128


# ---------------------------------------------------------------------------
# varbyte (LEB128-style, 7 bits per byte, little-endian groups)
# ---------------------------------------------------------------------------


def varbyte_encode(values: np.ndarray) -> bytes:
    """Vectorized varbyte encode of a uint64 array (values >= 0)."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    # byte length per value: number of 7-bit groups (at least 1)
    lengths = np.ones(v.size, dtype=np.int64)
    tmp = v >> np.uint64(7)
    while tmp.any():
        lengths += (tmp > 0).astype(np.int64)
        tmp = tmp >> np.uint64(7)
    total = int(lengths.sum())
    out = np.empty(total, dtype=np.uint8)
    # positions of each value's first byte
    starts = np.zeros(v.size, dtype=np.int64)
    np.cumsum(lengths[:-1], out=starts[1:])
    work = v.copy()
    offset = np.zeros(v.size, dtype=np.int64)
    remaining = lengths.copy()
    # peel one byte per iteration across all values still needing bytes
    while (remaining > 0).any():
        mask = remaining > 0
        idx = starts[mask] + offset[mask]
        byte = (work[mask] & np.uint64(0x7F)).astype(np.uint8)
        is_last = remaining[mask] == 1
        byte = np.where(is_last, byte, byte | np.uint8(0x80))
        out[idx] = byte
        work[mask] = work[mask] >> np.uint64(7)
        offset[mask] += 1
        remaining[mask] -= 1
    return out.tobytes()


def varbyte_decode(data: bytes) -> np.ndarray:
    """Vectorized varbyte decode -> uint64 array."""
    if not data:
        return np.empty(0, dtype=np.uint64)
    raw = np.frombuffer(data, dtype=np.uint8)
    is_cont = (raw & 0x80) > 0
    # value ends where continuation bit is clear
    ends = np.nonzero(~is_cont)[0]
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    payload = (raw & 0x7F).astype(np.uint64)
    # shift each byte by 7 * (position within its value)
    positions = np.arange(raw.size, dtype=np.int64)
    value_start = np.repeat(starts, ends - starts + 1)
    shifts = ((positions - value_start) * 7).astype(np.uint64)
    shifted = payload << shifts
    # segment sum via cumulative trick
    csum = np.concatenate(([np.uint64(0)], np.cumsum(shifted, dtype=np.uint64)))
    return csum[ends + 1] - csum[starts]


# ---------------------------------------------------------------------------
# delta-gap
# ---------------------------------------------------------------------------


def delta_encode(sorted_ids: np.ndarray) -> np.ndarray:
    """Strictly-increasing int64 ids -> gaps (first element stored +1 so all
    gaps are >= 1, making 0 an impossible value / corruption canary)."""
    ids = np.asarray(sorted_ids, dtype=np.int64)
    if ids.size == 0:
        return np.empty(0, dtype=np.uint64)
    gaps = np.empty(ids.size, dtype=np.uint64)
    gaps[0] = np.uint64(ids[0] + 1)
    if ids.size > 1:
        gaps[1:] = np.diff(ids).astype(np.uint64)
    return gaps


def delta_decode(gaps: np.ndarray) -> np.ndarray:
    g = np.asarray(gaps, dtype=np.uint64).astype(np.int64)
    if g.size == 0:
        return np.empty(0, dtype=np.int64)
    out = np.cumsum(g)
    return out - 1  # undo the +1 on the first element


# ---------------------------------------------------------------------------
# posting-list encode/decode with block metadata
# ---------------------------------------------------------------------------


def encode_postings(doc_ids: np.ndarray, tfs: np.ndarray) -> dict:
    """Encode one term's postings (doc_ids sorted strictly ascending).

    Returns dict with binary payloads + numpy block metadata; the caller
    flattens this into the segments-table row (one row per term per segment).
    """
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    tfs = np.asarray(tfs, dtype=np.int64)
    n = doc_ids.size
    assert n > 0 and tfs.size == n
    n_blocks = (n + BLOCK - 1) // BLOCK
    block_first = doc_ids[::BLOCK].copy()
    last_idx = np.minimum(np.arange(1, n_blocks + 1) * BLOCK, n) - 1
    block_last = doc_ids[last_idx].copy()
    # per-block max tf: the score-hint; true max-score is derived at query
    # time as idf * (max_tf_norm upper bound), see operators/search.py
    pad = (-n) % BLOCK
    tf_padded = np.concatenate([tfs, np.zeros(pad, dtype=np.int64)])
    block_max_tf = tf_padded.reshape(n_blocks, BLOCK).max(axis=1)
    return {
        "n_docs": int(n),
        "docs_blob": varbyte_encode(delta_encode(doc_ids)),
        "tfs_blob": varbyte_encode(tfs.astype(np.uint64)),
        "block_first": block_first,
        "block_last": block_last,
        "block_max_tf": block_max_tf,
        "max_tf": int(tfs.max()),
    }


def decode_postings(docs_blob: bytes, tfs_blob: bytes) -> tuple[np.ndarray, np.ndarray]:
    """-> (doc_ids int64 ascending, tfs int64)."""
    return delta_decode(varbyte_decode(docs_blob)), varbyte_decode(tfs_blob).astype(
        np.int64
    )


def merge_encoded(parts: list[dict]) -> dict:
    """Merge per-partition encoded postings of ONE term whose doc_id ranges
    are disjoint and given in ascending range order — concatenation is then
    order-safe (SURVEY.md §4 custom #1: salted sub-segments cover disjoint
    docID ranges, so the global list is the ordered concat)."""
    docs = np.concatenate(
        [decode_postings(p["docs_blob"], p["tfs_blob"])[0] for p in parts]
    )
    tfs = np.concatenate(
        [decode_postings(p["docs_blob"], p["tfs_blob"])[1] for p in parts]
    )
    return encode_postings(docs, tfs)
