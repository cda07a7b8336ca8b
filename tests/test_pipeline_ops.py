"""Functional tests for the training-data pipeline operators: planted
duplicates must be FOUND (not just hash-parity with the oracle), ANN recall
vs brute force, multimodal stub behavior."""

import pytest
from pyspark.sql import functions as F

from osu_elastic_indexer_spark.operators import dedup, similarity


@pytest.fixture(scope="module")
def planted(spark):
    """12 docs: 2 exact-dup groups, one near-dup pair (1 word of 60 changed),
    rest distinct."""
    base = " ".join(f"tok{i:03d}" for i in range(60))
    near = base.replace("tok030", "changed")
    rows = [
        (0, base),
        (1, base),            # exact dup of 0
        (2, near),            # near dup of 0
        (3, "totally different words here about cats and dogs " * 3),
        (4, "another unrelated document with its own vocabulary " * 3),
        (5, base),            # exact dup of 0
        (6, "short text"),
        (7, " ".join(f"x{i}" for i in range(50))),
        (8, " ".join(f"y{i}" for i in range(50))),
        (9, "the quick brown fox jumps over the lazy dog " * 5),
        (10, "the quick brown fox jumps over the lazy dog " * 5),  # dup of 9
        (11, ""),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_exact_dedup_finds_planted(planted):
    res = {
        r.keep_doc_id: r.n_docs
        for r in dedup.exact_duplicates(planted).collect()
    }
    assert res[0] == 3  # docs 0, 1, 5
    assert res[9] == 2  # docs 9, 10


def test_lsh_finds_near_dup(planted):
    pairs = {
        (r.doc_a, r.doc_b) for r in dedup.lsh_candidate_pairs(planted).collect()
    }
    # exact dups always collide on all bands; the near-dup pair must too
    assert (0, 1) in pairs and (0, 5) in pairs and (1, 5) in pairs
    assert (9, 10) in pairs
    assert (0, 2) in pairs  # 59/60 shingle overlap -> some band agrees
    # unrelated docs don't collide
    assert (3, 4) not in pairs


def test_ngram_jaccard_scores(planted):
    j = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup.ngram_jaccard_pairs(planted, threshold=0.0).collect()
    }
    assert j[(0, 1)] == 1.0
    assert 0.8 < j[(0, 2)] < 1.0  # near dup: high but not exact
    assert j[(9, 10)] == 1.0


def test_simhash_near_dup_close(planted, spark):
    rows = planted.filter(F.col("doc_id") < 3).select(
        "doc_id", dedup.simhash64(F.col("text")).alias("s")
    ).collect()
    s = {r.doc_id: r.s for r in rows}
    assert s[0] == s[1]  # identical docs -> identical simhash
    ham = bin((s[0] ^ s[2]) & ((1 << 64) - 1)).count("1")
    assert ham <= 6  # near dup -> small hamming distance on 64 bits


def test_ann_lsh_recall(spark):
    """LSH top-k recall vs brute force on deterministic vectors."""
    import numpy as np

    rng = np.random.default_rng(5)
    vecs = rng.normal(size=(300, 16)).astype("float32")
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(300)],
        "vec_id bigint, embedding array<float>",
    )
    q = [float(x) for x in vecs[0]]
    brute = [r.vec_id for r in similarity.brute_force_topk(df, q, 10, 0).collect()]
    approx = [r.vec_id for r in similarity.lsh_topk(df, q, 10, bits=4, exclude_vec_id=0).collect()]
    recall = len(set(brute) & set(approx)) / 10
    assert recall >= 0.3  # 4-bit buckets keep ~1/16 of candidates
    # every ANN hit must be a real doc with correct (exact) cosine
    got = {r.vec_id: r.cos for r in similarity.lsh_topk(df, q, 10, bits=4, exclude_vec_id=0).collect()}
    exact = {r.vec_id: r.cos for r in similarity.brute_force_topk(df, q, 300, 0).collect()}
    for v, c in got.items():
        assert abs(c - exact[v]) < 1e-9


def test_ann_multiprobe_recovers_recall(spark):
    """probes=bits+1 (all Hamming-1 neighbor buckets) must lift recall@10 to
    >=0.9 in exactly the regime single-probe loses: true near neighbors whose
    sign pattern differs by one bit (a coordinate sitting just across its
    hyperplane)."""
    import numpy as np

    rng = np.random.default_rng(11)
    bits = 8
    # one-hot planes make bucket bit j == sign of coordinate j, so the
    # planted one-bit-flip construction below is exact by design (the
    # production default is seeded random hyperplanes — same bucket algebra)
    planes = [[1.0 if j == i else 0.0 for j in range(16)] for i in range(bits)]
    q = rng.normal(size=16)
    q[:bits] = np.sign(q[:bits]) * np.maximum(np.abs(q[:bits]), 0.5)
    vecs = {0: q}
    # 7 same-bucket near copies, 5 neighbors with ONE bucket bit flipped
    for i in range(1, 8):
        vecs[i] = q + rng.normal(size=16) * 0.01
    for j in range(5):
        v = q + rng.normal(size=16) * 0.01
        v[j] = -0.05 * np.sign(q[j])  # flips exactly bucket bit j
        vecs[8 + j] = v
    for i in range(13, 500):
        vecs[i] = rng.normal(size=16)  # background noise, cos << planted
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs.items()],
        "vec_id bigint, embedding array<float>",
    )
    ql = [float(x) for x in q]
    brute = {r.vec_id for r in similarity.brute_force_topk(df, ql, 10, 0).collect()}
    assert brute <= set(range(1, 13)), "planted construction broken"
    recalls = {}
    for probes in (1, bits + 1):
        approx = {
            r.vec_id
            for r in similarity.lsh_topk(
                df, ql, 10, bits=bits, exclude_vec_id=0, probes=probes,
                planes=planes,
            ).collect()
        }
        recalls[probes] = len(brute & approx) / 10
    assert recalls[1] < 0.9, f"single-probe unexpectedly fine: {recalls}"
    assert recalls[bits + 1] >= 0.9, f"multi-probe recall too low: {recalls}"


def test_duplicate_clusters_transitive(planted):
    pairs = dedup.ngram_jaccard_pairs(planted, threshold=0.5)
    res = {
        r.doc_id: (r.cluster_id, r.keep)
        for r in dedup.duplicate_clusters(
            pairs, docs=planted.select("doc_id")
        ).collect()
    }
    # {0,1,2,5} one cluster (2 joins via near-dup of 0: transitive)
    assert res[0] == (0, True)
    assert res[1] == (0, False) and res[2] == (0, False) and res[5] == (0, False)
    assert res[9] == (9, True) and res[10] == (9, False)
    for single in (3, 4, 6, 7, 8, 11):
        assert res[single] == (single, True)
    assert len(res) == 12


def test_duplicate_clusters_chain(spark):
    """Propagation crosses a diameter-3 chain: 1-2-3-4 is ONE cluster even
    though (1,4) is not an edge."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "doc_a bigint, doc_b bigint"
    )
    res = {
        r.doc_id: r.cluster_id for r in dedup.duplicate_clusters(pairs).collect()
    }
    assert res == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_simhash_band_pairs_finds_planted(planted):
    pairs = {
        (r.doc_a, r.doc_b): r.hamming
        for r in dedup.simhash_band_pairs(planted, max_hamming=6).collect()
    }
    assert pairs[(0, 1)] == 0 and pairs[(0, 5)] == 0 and pairs[(9, 10)] == 0
    assert (0, 2) in pairs and pairs[(0, 2)] <= 6  # near dup
    assert (3, 4) not in pairs  # unrelated


def test_ann_ivf_probe_all_is_exact(spark):
    """IVF with nprobe == #centroids degenerates to exact brute force; a
    small nprobe still recalls planted near neighbors (they share the
    query's cell by construction of nearest-centroid assignment)."""
    import numpy as np

    rng = np.random.default_rng(23)
    vecs = {0: rng.normal(size=16)}
    for i in range(1, 9):
        vecs[i] = vecs[0] + rng.normal(size=16) * 0.05  # query's cluster
    for i in range(9, 400):
        vecs[i] = rng.normal(size=16) * 2.0
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs.items()],
        "vec_id bigint, embedding array<float>",
    )
    q = [float(x) for x in vecs[0]]
    brute = [(r.vec_id, r.cos) for r in similarity.brute_force_topk(df, q, 10, 0).collect()]
    n_cents = df.filter(F.col("vec_id") % 50 == 0).count()
    exact = [
        (r.vec_id, r.cos)
        for r in similarity.ivf_topk(
            df, q, 10, nprobe=n_cents, stride=50, exclude_vec_id=0
        ).collect()
    ]
    assert exact == brute  # all cells probed == exhaustive
    approx = {
        r.vec_id
        for r in similarity.ivf_topk(
            df, q, 10, nprobe=1, stride=50, exclude_vec_id=0
        ).collect()
    }
    hits = {v for v, _c in brute} & approx
    assert len(hits) >= 8  # planted cluster lands in the query's cell


def test_ann_ivf_kmeans_trainer_smoke(spark):
    """MLlib k-means coarse quantizer trains and plugs into ivf_topk."""
    import numpy as np

    rng = np.random.default_rng(29)
    df = spark.createDataFrame(
        [(i, [float(x) for x in rng.normal(size=8)]) for i in range(120)],
        "vec_id bigint, embedding array<float>",
    )
    cents = similarity.kmeans_centroids(df, k=4)
    assert cents.count() == 4
    q = [float(x) for x in rng.normal(size=8)]
    got = similarity.ivf_topk(df, q, 5, nprobe=4, centroids=cents).collect()
    brute = similarity.brute_force_topk(df, q, 5).collect()
    assert [r.vec_id for r in got] == [r.vec_id for r in brute]


def test_ann_indexed_paths_match_on_the_fly(spark, tmp_path):
    """The materialized index (bucket-partitioned LSH table, cid-partitioned
    IVF lists) must answer every query IDENTICALLY to the on-the-fly spec
    paths — same candidates, same cosines, same order."""
    import numpy as np

    from osu_elastic_indexer_spark.operators import ann_index

    rng = np.random.RandomState(17)
    rows = [
        (i, [float(x) for x in rng.standard_normal(16)]) for i in range(400)
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    idx = str(tmp_path / "ann")
    meta = ann_index.build_ann_index(spark, df, idx, bits=6, stride=50)
    q = rows[3][1]

    for probes in (1, 7):
        a = ann_index.lsh_topk_indexed(
            spark, idx, q, 10, probes=probes, exclude_vec_id=3
        ).collect()
        b = similarity.lsh_topk(
            df, q, 10, bits=6, exclude_vec_id=3, probes=probes,
            planes=meta["planes"],
        ).collect()
        assert [(r.vec_id, r.cos) for r in a] == [(r.vec_id, r.cos) for r in b]

    for nprobe in (1, 3):
        a = ann_index.ivf_topk_indexed(
            spark, idx, q, 10, nprobe=nprobe, exclude_vec_id=3
        ).collect()
        b = similarity.ivf_topk(
            df, q, 10, nprobe=nprobe, stride=50, exclude_vec_id=3
        ).collect()
        assert [(r.vec_id, r.cos) for r in a] == [(r.vec_id, r.cos) for r in b]


def test_near_dup_pairs_indexed_matches_on_the_fly(spark, tmp_path):
    """Stored-bucket near-dup pairs must equal the on-the-fly bucketed
    self-join (same hyperplanes, same cosine rounding)."""
    import numpy as np

    from osu_elastic_indexer_spark.operators import ann_index

    rng = np.random.RandomState(31)
    rows = []
    for i in range(120):
        rows.append((i, [float(x) for x in rng.standard_normal(12)]))
    for i in range(120, 140):  # planted near-dups of the first 20
        base = np.asarray(rows[i - 120][1])
        rows.append(
            (i, [float(x) for x in base + rng.standard_normal(12) * 0.01])
        )
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    idx = str(tmp_path / "ann")
    meta = ann_index.build_ann_index(spark, df, idx, bits=5, stride=30)
    got = {
        (r.vec_a, r.vec_b): r.cos
        for r in ann_index.near_dup_pairs_indexed(
            spark, idx, threshold=0.9
        ).collect()
    }
    ref = {
        (r.vec_a, r.vec_b): r.cos
        for r in similarity.embedding_near_dup_pairs(
            df, threshold=0.9, bits=5, planes=meta["planes"]
        ).collect()
    }
    assert got == ref
    # the planted pairs that share a bucket are found
    assert len(got) >= 10


def test_random_hyperplanes_beat_axis_signs_on_skewed_dims(spark):
    """Recall rationale for seeded random hyperplanes (vs the old
    coordinate-sign placeholder) at EQUAL bucket counts: when the first
    coordinates carry no signal (near-zero noise), axis-aligned sign bits
    bucket near-randomly, while random projections mix every dimension.
    Planted near-neighbor clusters live in the later dims only."""
    import numpy as np

    from osu_elastic_indexer_spark.operators.ann_index import (
        random_hyperplanes,
    )

    rng = np.random.default_rng(41)
    bits, dim = 6, 16
    q = np.concatenate([rng.normal(size=bits) * 1e-3, rng.normal(size=dim - bits)])
    vecs = {0: q}
    for i in range(1, 11):  # near neighbors: same tail, re-rolled noisy head
        vecs[i] = np.concatenate(
            [rng.normal(size=bits) * 1e-3, q[bits:] + rng.normal(size=dim - bits) * 0.02]
        )
    for i in range(11, 600):
        vecs[i] = np.concatenate(
            [rng.normal(size=bits) * 1e-3, rng.normal(size=dim - bits)]
        )
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs.items()],
        "vec_id bigint, embedding array<float>",
    )
    ql = [float(x) for x in q]
    brute = {r.vec_id for r in similarity.brute_force_topk(df, ql, 10, 0).collect()}
    axis_planes = [
        [1.0 if j == i else 0.0 for j in range(dim)] for i in range(bits)
    ]

    def recall(planes):
        approx = {
            r.vec_id
            for r in similarity.lsh_topk(
                df, ql, 10, bits=bits, exclude_vec_id=0, planes=planes
            ).collect()
        }
        return len(brute & approx) / len(brute)

    r_axis = recall(axis_planes)
    r_rand = recall(random_hyperplanes(dim, bits))
    assert r_rand > r_axis, (r_rand, r_axis)
    assert r_rand >= 0.8, r_rand


def test_ngram_jaccard_reuses_shingles(planted):
    """The jaccard plan must read the persisted shingle table (InMemory
    scans), not recompute tokenize->shingle->md5 per consumer."""
    df = dedup.ngram_jaccard_pairs(planted, threshold=0.0)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("InMemoryRelation") >= 3  # bands + both join sides


def test_multimodal_stub_contract(spark):
    from osu_elastic_indexer_spark.functions import multimodal

    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"\x89PNG")
    with pytest.raises(NotImplementedError):
        multimodal.decode_audio(b"RIFF")
    # plumbing over real binary html payloads
    df = spark.createDataFrame(
        [("a", b"<html>x</html>"), ("b", b""), ("c", None)],
        "k string, payload binary",
    )
    meta = {r.doc_key: r for r in multimodal.attach_metadata(df, "k", "payload").collect()}
    assert meta["a"].n_bytes == 14
    assert meta["b"].n_bytes == 0 and meta["c"].n_bytes == 0
    assert meta["a"].fake_width >= 1 and meta["a"].fake_height >= 1
    frames = multimodal.sample_frames(df, "k", "payload", n_frames=3).collect()
    assert len(frames) == 9  # 3 per doc, empties included deterministically


def test_simhash_band_pairs_key_blocks_widths(planted):
    """VERDICT r3 #5: key_blocks is a parameter — planted pairs must be
    found at BOTH band widths (2-block/16-bit and 3-block/24-bit keys),
    and the function must refuse a threshold its banding cannot cover
    completely (hamming > 8 - key_blocks would be a silent recall hole)."""
    import pytest as _pytest

    for kb, max_h in ((2, 6), (3, 5)):
        pairs = {
            (r.doc_a, r.doc_b): r.hamming
            for r in dedup.simhash_band_pairs(
                planted, max_hamming=max_h, key_blocks=kb
            ).collect()
        }
        assert pairs[(0, 1)] == 0 and pairs[(0, 5)] == 0, f"kb={kb}"
        assert pairs[(9, 10)] == 0, f"kb={kb}"
        assert (0, 2) in pairs and pairs[(0, 2)] <= max_h, f"kb={kb}"
        assert (3, 4) not in pairs, f"kb={kb}"
    with _pytest.raises(ValueError):
        dedup.simhash_band_pairs(planted, max_hamming=6, key_blocks=3)


def test_ivf_trained_quantizer_through_index(spark, tmp_path):
    """VERDICT r3 #8: the production k-means quantizer must flow through
    build_ann_index(centroids=...) + ivf_topk_indexed. Recall vs brute
    force at equal nprobe must be at least the seed-centroid path's (a
    trained quantizer can only tighten the cells around real clusters).
    The oracle-checked driver entry stays on seed centroids (k-means is
    iterative, not SQL-expressible)."""
    import numpy as np

    from osu_elastic_indexer_spark.operators.ann_index import (
        build_ann_index,
        ivf_topk_indexed,
    )

    rng = np.random.default_rng(31)
    # 4 planted clusters + noise, so a trained quantizer has structure
    centers = rng.normal(size=(4, 16)) * 3.0
    rows = []
    for i in range(400):
        c = centers[i % 4]
        rows.append((i, [float(x) for x in c + rng.normal(size=16) * 0.3]))
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    q = rows[0][1]
    brute = {
        r.vec_id
        for r in similarity.brute_force_topk(df, q, 10, 0).collect()
    }

    def recall(index_dir):
        got = {
            r.vec_id
            for r in ivf_topk_indexed(
                spark, index_dir, q, 10, nprobe=2, exclude_vec_id=0
            ).collect()
        }
        return len(got & brute) / len(brute)

    seed_idx = str(tmp_path / "ann_seed")
    build_ann_index(spark, df, seed_idx, bits=4, stride=40)
    trained_idx = str(tmp_path / "ann_trained")
    cents = similarity.kmeans_centroids(df, k=8, seed=7)
    build_ann_index(spark, df, trained_idx, bits=4, centroids=cents)
    r_seed, r_trained = recall(seed_idx), recall(trained_idx)
    assert r_trained >= r_seed, (r_trained, r_seed)
    assert r_trained >= 0.9  # planted cluster shares the query's cell


def _mk_wav(doc_id: int, n: int = 800, sr: int = 8000) -> bytes:
    """Deterministic 16-bit mono PCM: s_i = ((doc_id*31 + i*17) % 65536)
    - 32768 — integer math a SQL twin can reproduce exactly."""
    import io
    import wave

    import numpy as np

    i = np.arange(n, dtype=np.int64)
    s = ((doc_id * 31 + i * 17) % 65536 - 32768).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(s.tobytes())
    return buf.getvalue()


def _mk_ppm(seed: int, w: int = 8, h: int = 6) -> bytes:
    import numpy as np

    px = ((np.arange(w * h * 3, dtype=np.int64) * 37 + seed) % 256).astype(
        np.uint8
    )
    return b"P6\n# test raster\n%d %d\n255\n" % (w, h) + px.tobytes()


def test_multimodal_real_wav_decode(spark):
    """REAL audio kernel end-to-end through the Spark plumbing: stdlib
    wave decode inside mapInPandas, features cross-checked against direct
    numpy on the same bytes."""
    import numpy as np

    from osu_elastic_indexer_spark.functions import multimodal

    payloads = {str(d): _mk_wav(d, n=800 + 50 * d) for d in range(4)}
    df = spark.createDataFrame(
        [(k, bytearray(v)) for k, v in payloads.items()], "k string, payload binary"
    )
    got = {
        r.doc_key: r
        for r in multimodal.extract_audio_features(df, "k", "payload").collect()
    }
    assert set(got) == set(payloads)
    for k, b in payloads.items():
        d = multimodal.decode_audio(b)
        assert d["sample_rate"] == 8000 and d["channels"] == 1
        s = d["samples"].astype(np.float64) / 32768.0
        r = got[k]
        assert r.n_samples == 800 + 50 * int(k)
        assert r.duration_s == pytest.approx(r.n_samples / 8000.0)
        assert r.rms == pytest.approx(float(np.sqrt((s * s).mean())))
        assert r.peak == pytest.approx(float(np.abs(s).max()))


def test_multimodal_real_ppm_decode(spark):
    """REAL image kernel: netpbm P6 parse (with a header comment) through
    mapInPandas; P5 grayscale and 16-bit maxval also decode."""
    import numpy as np

    from osu_elastic_indexer_spark.functions import multimodal

    payloads = {str(s): _mk_ppm(s) for s in range(3)}
    df = spark.createDataFrame(
        [(k, bytearray(v)) for k, v in payloads.items()], "k string, payload binary"
    )
    got = {
        r.doc_key: r
        for r in multimodal.extract_image_meta(df, "k", "payload").collect()
    }
    for k, b in payloads.items():
        w, h, mv, px = multimodal.decode_image(b)
        assert (w, h, mv, px.shape) == (8, 6, 255, (6, 8, 3))
        r = got[k]
        assert (r.width, r.height, r.maxval, r.channels) == (8, 6, 255, 3)
        assert r.mean_luma == pytest.approx(px.astype(np.float64).mean() / 255)
    # P5 grayscale
    g = b"P5\n4 2\n255\n" + bytes(range(8))
    w, h, mv, px = multimodal.decode_image(g)
    assert (w, h, px.shape) == (4, 2, (2, 4)) and px.tolist()[0] == [0, 1, 2, 3]
    # 16-bit maxval -> big-endian uint16 samples
    hdr16 = b"P5\n2 1\n65535\n" + (1000).to_bytes(2, "big") + (2).to_bytes(2, "big")
    _w, _h, mv16, px16 = multimodal.decode_image(hdr16)
    assert mv16 == 65535 and px16.tolist() == [[1000, 2]]
