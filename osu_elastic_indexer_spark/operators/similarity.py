"""Similarity search over embedding columns (array<float>).

Training-data-pipeline component (task brief): brute-force cosine top-k as
the exact baseline, plus an LSH-bucketed variant as the scale path.

Float discipline: cosine is computed as ordered folds over the vector index
(F.aggregate over zip_with is strictly sequential), matching an ORDER BY
ordinal sum in the SQL oracle; scores surfaced rounded.

Scale notes:
  * brute force is one broadcast of the query vector + a TakeOrderedAndProject
    — exact, O(n·d), the right baseline and the verifier for ANN variants.
  * sign-LSH buckets (seeded random hyperplanes, ann_index.py) cut
    candidates by ~2^bits; recall measured against the brute-force baseline
    in tests. The bucket expressions here are the on-the-fly spec; the
    materialized bucket-partitioned table in ann_index.py is the scale path.
  * embedding near-dup: pairwise cosine within buckets — the standard
    blocked self-join, never O(n^2) across the corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot_expr(a: Column, b: Column) -> Column:
    """Ordered-fold dot product of two equal-length double arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(dot_expr(a, a))


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def brute_force_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    exclude_vec_id: int | None = None,
) -> DataFrame:
    """Exact cosine top-k: (vec_id, cos). Query vector broadcast as a
    literal; plan is scan -> project -> TakeOrderedAndProject."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    out = embeddings.select(
        "vec_id",
        F.round(cosine_expr(_as_double(F.col("embedding")), q), 6).alias("cos"),
    )
    if exclude_vec_id is not None:
        out = out.filter(F.col("vec_id") != exclude_vec_id)
    return out.orderBy(F.desc("cos"), F.asc("vec_id")).limit(k)


def _default_planes(embeddings: DataFrame, bits: int) -> list[list[float]]:
    """Seeded random hyperplanes sized to the corpus's vector dim (one tiny
    head() to read the dim; callers that know it pass planes explicitly)."""
    from .ann_index import random_hyperplanes

    first = embeddings.select(F.size("embedding").alias("d")).head()
    return random_hyperplanes(int(first.d) if first is not None else 0, bits)


def probe_buckets(bucket: int, bits: int, probes: int) -> list[int]:
    """Multi-probe sequence: the query's own bucket, then every bucket at
    Hamming distance 1 (ascending flipped-bit index), then distance 2 —
    truncated to ``probes``. Near neighbors that fall just across a
    hyperplane land in a distance-1 bucket, so probing them recovers the
    recall a single-bucket lookup loses as buckets shrink (the standard
    multi-probe LSH argument, Lv et al., VLDB'07)."""
    out = [bucket]
    for i in range(bits):
        out.append(bucket ^ (1 << i))
    for i in range(bits):
        for j in range(i + 1, bits):
            out.append(bucket ^ (1 << i) ^ (1 << j))
    return out[: max(1, probes)]


def lsh_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    bits: int = 8,
    exclude_vec_id: int | None = None,
    probes: int = 1,
    planes: list[list[float]] | None = None,
) -> DataFrame:
    """ANN: brute-force cosine within the query's sign-LSH bucket (seeded
    random hyperplanes) plus its ``probes-1`` nearest (Hamming-adjacent)
    buckets. probes=1 is the classic single-bucket lookup (recall falls off
    a cliff as buckets shrink); probes=bits+1 covers all Hamming-1
    neighbors — tests assert the recall difference vs brute force.

    NOTE on scale: the bucket here is a COMPUTED expression, so this is the
    on-the-fly spec path — every row is still scanned (the cut is compute,
    not IO). The scale path is ann_index.lsh_topk_indexed over the STORED
    bucket-partitioned table, where the probe set prunes at the
    parquet-partition level."""
    from .ann_index import hyperplane_bucket, hyperplane_bucket_expr

    if planes is None:
        planes = _default_planes(embeddings, bits)
    buckets = probe_buckets(hyperplane_bucket(query_vec, planes), bits, probes)
    cand = embeddings.filter(
        hyperplane_bucket_expr(_as_double(F.col("embedding")), planes).isin(
            buckets
        )
    )
    return brute_force_topk(cand, query_vec, k, exclude_vec_id)


def sq_dist_expr(a: Column, b: Column) -> Column:
    """Ordered-fold squared L2 distance of two equal-length double arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def seed_centroids(embeddings: DataFrame, stride: int = 62) -> DataFrame:
    """Deterministic IVF seed centroids: every stride-th vector (cid, cv).
    Reproducible in ANSI SQL (vec_id % stride = 0) so the oracle sees the
    same quantizer. Production path: kmeans_centroids() below."""
    return embeddings.filter(F.col("vec_id") % stride == 0).select(
        F.col("vec_id").alias("cid"),
        _as_double(F.col("embedding")).alias("cv"),
    )


def kmeans_centroids(embeddings: DataFrame, k: int = 16, seed: int = 7) -> DataFrame:
    """Real coarse quantizer: Spark MLlib k-means over the embedding column
    -> (cid, cv). Not SQL-reproducible (iterative), so the oracle-checked
    entry uses seed_centroids; this is the production trainer."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    df = embeddings.select(
        "vec_id", array_to_vector(_as_double(F.col("embedding"))).alias("features")
    )
    model = KMeans(k=k, seed=seed).fit(df)
    spark = embeddings.sparkSession
    return spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        "cid bigint, cv array<double>",
    )


def ivf_assign(embeddings: DataFrame, centroids: DataFrame) -> DataFrame:
    """(vec_id, cid): nearest-centroid assignment — the IVF coarse quantizer.

    Broadcast cross join against the (small) centroid table, then struct-min
    argmin. Distances are ROUNDED to 6 dp before the argmin so the decision
    is bit-reproducible across engines (DuckDB oracle parity); exact ties
    break by cid asc via the struct ordering.

    At corpus scale the assignment is written once, partitioned/clustered by
    cid — a query's nprobe cells then prune to ~nprobe/C of the data at the
    parquet-partition level."""
    e = embeddings.select(
        "vec_id", _as_double(F.col("embedding")).alias("v")
    )
    joined = e.crossJoin(F.broadcast(centroids))
    d = F.round(sq_dist_expr(F.col("v"), F.col("cv")), 6)
    return (
        joined.groupBy("vec_id")
        .agg(F.min(F.struct(d.alias("d"), F.col("cid"))).alias("m"))
        .select("vec_id", F.col("m.cid").alias("cid"))
    )


def ivf_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 2,
    stride: int = 62,
    centroids: DataFrame | None = None,
    exclude_vec_id: int | None = None,
) -> DataFrame:
    """IVF ANN: brute-force cosine within the query's ``nprobe`` nearest
    centroid cells. Exactness is traded for a ~nprobe/C candidate cut; with
    nprobe = C it degenerates to exact brute force (tested)."""
    cents = centroids if centroids is not None else seed_centroids(embeddings, stride)
    rows = cents.collect()  # C rows — the quantizer is tiny by construction
    qd = []
    for r in rows:
        s = 0.0
        for x, y in zip([float(v) for v in r.cv], [float(v) for v in query_vec]):
            s += (x - y) * (x - y)
        qd.append((round(s, 6), int(r.cid)))
    probe = [cid for _d, cid in sorted(qd)[: max(1, nprobe)]]
    assign = ivf_assign(embeddings, cents)
    cand = embeddings.join(
        assign.filter(F.col("cid").isin(probe)).select("vec_id"),
        "vec_id",
        "left_semi",
    )
    return brute_force_topk(cand, query_vec, k, exclude_vec_id)


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.9,
    bits: int = 8,
    planes: list[list[float]] | None = None,
) -> DataFrame:
    """Near-duplicate pairs by cosine within sign-LSH buckets (seeded random
    hyperplanes): (vec_a, vec_b, cos) with cos >= threshold, vec_a < vec_b."""
    from .ann_index import hyperplane_bucket_expr

    if planes is None:
        planes = _default_planes(embeddings, bits)
    withb = embeddings.select(
        "vec_id",
        _as_double(F.col("embedding")).alias("v"),
        hyperplane_bucket_expr(_as_double(F.col("embedding")), planes).alias(
            "bucket"
        ),
    )
    a = withb.select(
        F.col("bucket"), F.col("vec_id").alias("vec_a"), F.col("v").alias("va")
    )
    b = withb.select(
        F.col("bucket"), F.col("vec_id").alias("vec_b"), F.col("v").alias("vb")
    )
    return (
        a.join(b, "bucket")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a", "vec_b", F.round(cosine_expr(F.col("va"), F.col("vb")), 6).alias("cos")
        )
        .filter(F.col("cos") >= threshold)
    )
