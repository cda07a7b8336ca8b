"""Materialized ANN index structures: IVF inverted lists + LSH bucket table.

The on-the-fly paths in operators/similarity.py recompute the coarse-quantizer
assignment (IVF) or evaluate the bucket expression over every row (LSH) per
query — fine as a spec, wrong at corpus scale. This module is the scale path:

  * ``build_ann_index`` writes, once per corpus snapshot:
      - ``lsh/``       (vec_id, embedding) parquet PARTITIONED BY bucket —
                       a query's probe set prunes to ~probes/2^bits of the
                       data at the parquet-partition level (no row scanned
                       outside the probed buckets);
      - ``centroids/`` (cid, cv) — the tiny coarse quantizer;
      - ``ivf/``       (vec_id, embedding) parquet PARTITIONED BY cid — the
                       IVF inverted lists; a query's nprobe cells prune to
                       ~nprobe/C of the data;
      - ``meta.json``  seed, bits, dim, the hyperplane matrix, row count —
                       so query-time bucketing and the SQL oracle reproduce
                       the index's decisions exactly.
  * ``lsh_topk_indexed`` / ``ivf_topk_indexed`` answer queries with a
    partition-pruned scan + brute-force cosine over the candidates only.

Hyperplanes are seeded random projections (Charikar sign-LSH), generated
deterministically and stored in meta.json: both the query path and the
DuckDB oracle consume the same literal matrix, so bucket decisions are
bit-reproducible across engines (ordered double folds on both sides).

At 10^12 vectors the same layout holds: the partition column bounds every
query to its probed cells; assignment is computed once per snapshot by a
single broadcast-join pass (similarity.ivf_assign), and re-clustering is a
rewrite of ``ivf/`` alone.
"""

from __future__ import annotations

import json
import os

import numpy as np
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .similarity import (
    _as_double,
    brute_force_topk,
    dot_expr,
    ivf_assign,
    probe_buckets,
    seed_centroids,
)

ANN_FORMAT = 1
HYPERPLANE_SEED = 7


def random_hyperplanes(
    dim: int, bits: int = 8, seed: int = HYPERPLANE_SEED
) -> list[list[float]]:
    """Seeded random projection matrix (bits x dim), values rounded to 4 dp
    so the literals embed compactly in SQL. Deterministic (MT19937): the
    same (dim, bits, seed) always yields the same planes, and the planes
    are shipped as LITERALS to both engines — no cross-engine RNG."""
    rs = np.random.RandomState(seed)
    return [
        [round(float(x), 4) for x in rs.standard_normal(dim)]
        for _ in range(bits)
    ]


def hyperplane_bucket_expr(vec: Column, planes: list[list[float]]) -> Column:
    """Packed sign bits of dot(plane_i, vec) — the Charikar sign-LSH bucket.
    Each dot is an ordered fold over the vector index (strictly sequential
    double adds), matching the SQL oracle's list_reduce fold bit-for-bit."""
    total = F.lit(0).cast("bigint")
    for i, p in enumerate(planes):
        lit_plane = F.array(*[F.lit(float(x)) for x in p])
        total = total + F.when(
            dot_expr(vec, lit_plane) >= 0, F.lit(1 << i).cast("bigint")
        ).otherwise(F.lit(0).cast("bigint"))
    return total


def hyperplane_bucket(query_vec: list[float], planes: list[list[float]]) -> int:
    """Driver-side bucket of a query vector (same ordered-fold arithmetic:
    python float adds are IEEE doubles in index order)."""
    b = 0
    for i, p in enumerate(planes):
        s = 0.0
        for x, y in zip(query_vec, p):
            s = s + float(x) * float(y)
        if s >= 0:
            b |= 1 << i
    return b


def build_ann_index(
    spark: SparkSession,
    embeddings: DataFrame,
    out_dir: str,
    *,
    bits: int = 8,
    seed: int = HYPERPLANE_SEED,
    stride: int = 62,
    centroids: DataFrame | None = None,
    fingerprint: str | None = None,
) -> dict:
    """Write the materialized ANN index (see module doc). ``embeddings``:
    (vec_id bigint, embedding array<float|double>). Returns the meta dict.

    One pass per structure: the LSH write is a single scan + bucket project
    + partitioned write; the IVF write is one broadcast-join assignment pass
    + partitioned write. Neither shuffles beyond the partitioned-write
    exchange on its partition column."""
    first = embeddings.select(F.size("embedding").alias("d")).head()
    dim = int(first.d) if first is not None else 0
    planes = random_hyperplanes(dim, bits, seed)

    lsh_dir = os.path.join(out_dir, "lsh")
    ivf_dir = os.path.join(out_dir, "ivf")
    cent_dir = os.path.join(out_dir, "centroids")

    v = _as_double(F.col("embedding"))
    embeddings.select(
        "vec_id",
        F.col("embedding"),
        hyperplane_bucket_expr(v, planes).alias("bucket"),
    ).write.mode("overwrite").partitionBy("bucket").parquet(lsh_dir)

    cents = (
        centroids
        if centroids is not None
        else seed_centroids(embeddings, stride)
    )
    cents.write.mode("overwrite").parquet(cent_dir)
    cents = spark.read.parquet(cent_dir)  # read back: one stable snapshot
    assign = ivf_assign(embeddings, cents)
    embeddings.join(assign, "vec_id").select(
        "vec_id", "embedding", "cid"
    ).write.mode("overwrite").partitionBy("cid").parquet(ivf_dir)

    meta = {
        "format": ANN_FORMAT,
        "bits": bits,
        "seed": seed,
        "dim": dim,
        "stride": stride,
        "planes": planes,
        "n_rows": embeddings.count(),
        # caller-supplied corpus content fingerprint (cache invalidation)
        "fingerprint": fingerprint,
    }
    tmp = os.path.join(out_dir, "meta.json.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(out_dir, "meta.json"))
    return meta


def read_ann_meta(index_dir: str) -> dict | None:
    p = os.path.join(index_dir, "meta.json")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def lsh_topk_indexed(
    spark: SparkSession,
    index_dir: str,
    query_vec: list[float],
    k: int = 10,
    probes: int = 1,
    exclude_vec_id: int | None = None,
) -> DataFrame:
    """ANN top-k through the materialized LSH table: the probe set is a
    PARTITION filter on the stored bucket column — only the probed buckets'
    files are listed/read (plan-asserted in tests/test_plans.py)."""
    meta = read_ann_meta(index_dir)
    assert meta is not None, f"no ANN index at {index_dir}"
    qb = hyperplane_bucket(query_vec, meta["planes"])
    buckets = probe_buckets(qb, int(meta["bits"]), probes)
    cand = spark.read.parquet(os.path.join(index_dir, "lsh")).filter(
        F.col("bucket").isin(buckets)
    )
    return brute_force_topk(cand, query_vec, k, exclude_vec_id)


def near_dup_pairs_indexed(
    spark: SparkSession,
    index_dir: str,
    threshold: float = 0.9,
) -> DataFrame:
    """Embedding near-duplicate pairs over the MATERIALIZED LSH table:
    (vec_a, vec_b, cos) with cos >= threshold, vec_a < vec_b.

    Pair generation is a single GROUPED pass (groupBy bucket +
    applyInPandas): each bucket's members shuffle ONCE to their group and
    the pairs are emitted in-worker — no self-join, so the raw embedding
    vectors cross the network exactly once instead of twice (a bucket
    self-join hash-exchanges BOTH sides; parquet partitionBy carries no
    bucketed-join metadata that would let Catalyst elide it). The plan is
    Scan -> one Exchange(bucket) -> FlatMapGroupsInPandas — asserted in
    tests/test_plans.py. Per-bucket work is blocked (row-block x members),
    so worker memory is O(block x bucket), never O(bucket^2) at once.

    Float discipline: the in-worker cosine accumulates per-DIMENSION in
    index order (one fused add per dimension), which is bit-identical to
    similarity.cosine_expr's sequential F.aggregate fold and to the SQL
    oracle's ordinal list_reduce; rounding stays in the Spark plan
    (F.round) so engine rounding semantics are shared with every other
    entry. Candidate generation equals similarity.embedding_near_dup_pairs
    PROVIDED the index was built with the same (seed, bits) hyperplanes
    the on-the-fly path derives (the build records both in meta.json; the
    parity test pins the default HYPERPLANE_SEED/bits on both sides — an
    index built with a different seed is a different, equally valid LSH
    blocking and its candidate set legitimately differs)."""
    import pandas as pd

    # emit with >= (threshold - slack) RAW cosine: F.round(.., 6) moves a
    # value by at most 5e-7, so the in-worker pre-filter can only keep a
    # superset of the post-round survivors (bounds UDF output volume
    # without taking over the engine-level rounding decision)
    thr_slack = float(threshold) - 1e-6

    def emit_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vec_id")
        ids = pdf["vec_id"].to_numpy()
        m = len(ids)
        if m < 2:
            return pd.DataFrame(
                {"vec_a": [], "vec_b": [], "cos_raw": []}
            ).astype({"vec_a": "int64", "vec_b": "int64", "cos_raw": "float64"})
        X = np.asarray(
            [np.asarray(v, dtype=np.float64) for v in pdf["embedding"]]
        )
        d = X.shape[1]
        # sequential-order norms: acc + x*x per dimension, index order —
        # the same left fold as dot_expr(a, a)
        nsq = np.zeros(m)
        for t in range(d):
            nsq += X[:, t] * X[:, t]
        nrm = np.sqrt(nsq)
        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        out_c: list[np.ndarray] = []
        B = 1024
        for s in range(0, m, B):
            e = min(s + B, m)
            # G[i-s, j] = ordered fold over t of X[i,t]*X[j,t]
            G = np.zeros((e - s, m))
            for t in range(d):
                G += np.outer(X[s:e, t], X[:, t])
            C = G / (nrm[s:e, None] * nrm[None, :])
            for li in range(e - s):
                gi = s + li
                row = C[li, gi + 1 :]
                js = np.flatnonzero(row >= thr_slack)
                if js.size:
                    out_a.append(np.full(js.size, ids[gi]))
                    out_b.append(ids[gi + 1 + js])
                    out_c.append(row[js])
        if not out_a:
            return pd.DataFrame(
                {"vec_a": [], "vec_b": [], "cos_raw": []}
            ).astype({"vec_a": "int64", "vec_b": "int64", "cos_raw": "float64"})
        return pd.DataFrame(
            {
                "vec_a": np.concatenate(out_a).astype("int64"),
                "vec_b": np.concatenate(out_b).astype("int64"),
                "cos_raw": np.concatenate(out_c),
            }
        )

    lsh = spark.read.parquet(os.path.join(index_dir, "lsh"))
    pairs = lsh.select("bucket", "vec_id", "embedding").groupBy(
        "bucket"
    ).applyInPandas(
        emit_pairs, "vec_a bigint, vec_b bigint, cos_raw double"
    )
    return pairs.select(
        "vec_a", "vec_b", F.round(F.col("cos_raw"), 6).alias("cos")
    ).filter(F.col("cos") >= threshold)


def ivf_topk_indexed(
    spark: SparkSession,
    index_dir: str,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 2,
    exclude_vec_id: int | None = None,
) -> DataFrame:
    """IVF top-k through the materialized inverted lists: centroid probe is
    a driver-side scan of the tiny quantizer; the cell set is a PARTITION
    filter on the stored cid column (pruned file listing, no full-corpus
    assignment recompute)."""
    meta = read_ann_meta(index_dir)
    assert meta is not None, f"no ANN index at {index_dir}"
    cents = spark.read.parquet(os.path.join(index_dir, "centroids")).collect()
    qd = []
    for r in cents:
        s = 0.0
        for x, y in zip([float(v) for v in r.cv], [float(v) for v in query_vec]):
            s += (x - y) * (x - y)
        qd.append((round(s, 6), int(r.cid)))
    probe = [cid for _d, cid in sorted(qd)[: max(1, nprobe)]]
    cand = spark.read.parquet(os.path.join(index_dir, "ivf")).filter(
        F.col("cid").isin(probe)
    )
    return brute_force_topk(cand, query_vec, k, exclude_vec_id)
