"""Benchmark harness — prints ONE JSON line per run.

Headline numbers (BASELINE.json metric):
  * index-build throughput (docs/sec): full SPIMI build over the synthetic
    webtext corpus sized by the scale factor (FIXTURES.md §1)
  * BM25 top-10 latency: block-max WAND, batch-of-20 reference queries as
    one Spark job, plus per-query p50 over individual jobs
  * relational operator sanity: two oracle-checked queries at the sf dir

Env: SPARK_GRAFT_SF_DIR  (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS    (default 32),
     SPARK_GRAFT_BUILD_SF (default = sf of SF_DIR): scale factor for the
       index-build corpus alone — lets the build throughput be measured at
       >=1M docs (where job setup stops dominating) while the relational
       queries still run at the driver's sf dir.

Scaling evidence (north_rule, sandbox form) lives in bench/scaling.py —
same build at local[8] vs local[32] -> BASELINE.md §3.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def corpus_for_sf(sf: float, tmp_root: str = "/tmp/oei_bench") -> tuple[str, int]:
    """Deterministic corpus parquet for the scale factor, cached across runs."""
    from osu_elastic_indexer_spark.sources.fixtures import write_corpus

    n_docs = max(1000, int(round(1_000_000 * sf)))
    os.makedirs(tmp_root, exist_ok=True)
    path = os.path.join(tmp_root, f"documents_n{n_docs}_v1.parquet")
    if not os.path.exists(path):
        t0 = time.time()
        write_corpus(path, n_docs)
        print(
            f"[bench] generated corpus n={n_docs} in {time.time()-t0:.1f}s",
            file=sys.stderr,
        )
    return path, n_docs


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.1
    build_sf = float(os.environ.get("SPARK_GRAFT_BUILD_SF", sf))

    from osu_elastic_indexer_spark.operators.build import build_index
    from osu_elastic_indexer_spark.operators.wand import wand_topk
    from osu_elastic_indexer_spark.session import get_spark
    from osu_elastic_indexer_spark.sources.catalog import Catalog
    from osu_elastic_indexer_spark.sources.fixtures import reference_queries

    corpus_path, n_docs = corpus_for_sf(build_sf)
    spark = get_spark("bench", cores=cpus)
    from osu_elastic_indexer_spark.session import warm_python_workers

    warm_python_workers(spark, cpus)
    queries: dict[str, float] = {}
    extras: dict[str, float] = {}

    # ---- index build (best-of-2: the sandbox box has intermittent minutes-
    # long ~5x CPU-degradation windows — a single shot can be 5x off; both
    # runs are disclosed in build_sec_runs) ---------------------------------
    import shutil as _sh

    docs = spark.read.parquet(corpus_path)
    build_runs = []
    for attempt in range(2):
        # ALWAYS two runs (disclosed in build_sec_runs): single shots swing
        # ~2x at sf0.1 (measured 18.2 / 11.6 / 10.8 back-to-back, and a
        # fast-then-slow 12.3 / 18.6 pair) — the box's degradation windows
        # plus first-build python-worker spawn. min is the real cost; the
        # old clean-window early-exit kept whatever the first shot was.
        root = f"/tmp/oei_bench/idx_{n_docs}_{cpus}_{os.getpid()}_{attempt}"
        cat = Catalog(root)
        t0 = time.time()
        manifest = build_index(spark, docs, cat, "bench")
        build_runs.append((round(time.time() - t0, 3), root, manifest))
    build_runs.sort(key=lambda r: r[0])
    t_build, root, manifest = build_runs[0]
    for _t, extra_root, _m in build_runs[1:]:
        _sh.rmtree(extra_root, ignore_errors=True)
    cat = Catalog(root)
    queries["build_index"] = t_build
    extras["build_sec_runs"] = [r[0] for r in build_runs]
    extras["build_docs"] = manifest["counters"]["docs"]
    extras["build_docs_per_sec"] = round(manifest["counters"]["docs"] / t_build, 1)
    extras["index_bytes"] = manifest["counters"]["bytes"]

    idx_dir = cat.index_dir("bench")
    qs = [(qid, q) for qid, q, _k in reference_queries()]

    def timed(name: str, fn, runs: int = 2) -> None:
        """Best-of-N (like the build measurement): the sandbox box has
        intermittent multi-minute ~5x CPU-degradation windows, so a single
        shot can be badly off — the min is the real cost, both runs are
        disclosed in <name>_runs (first run additionally carries any
        first-call session cost: broadcast setup, python-worker reuse)."""
        ts = []
        for _ in range(runs):
            t0 = time.time()
            fn()
            ts.append(round(time.time() - t0, 3))
        queries[name] = min(ts)
        extras[f"{name}_runs"] = ts

    # ---- WAND batch (all 20 queries, one job) ------------------------------
    extras["wand_batch_rows"] = wand_topk(spark, idx_dir, qs, 10).count()
    timed("wand_batch20", lambda: wand_topk(spark, idx_dir, qs, 10).count())

    # ---- document-partitioned batch (blobs shuffle once, query-count-free) -
    from osu_elastic_indexer_spark.operators.wand import wand_topk_docpart

    timed(
        "wand_docpart20",
        lambda: wand_topk_docpart(spark, idx_dir, qs, 10).count(),
    )

    # ---- WAND per-query p50 (individual jobs, warm JVM) --------------------
    # best-of-2 PER QUERY (same box-noise protocol as timed()): two full
    # sweeps, per-query min, both sweeps' p50s disclosed — single-shot
    # percentiles produced phantom regressions in r4/r5 (VERDICT r5 #4)
    sweeps = []
    for _ in range(2):
        lat1 = []
        for qid, q in qs[:10]:
            t0 = time.time()
            wand_topk(spark, idx_dir, [(qid, q)], 10).collect()
            lat1.append(time.time() - t0)
        sweeps.append(lat1)
    lat = sorted(min(a, b) for a, b in zip(*sweeps))
    queries["wand_single_p50"] = round(lat[len(lat) // 2], 3)
    extras["wand_single_p90"] = round(lat[int(len(lat) * 0.9)], 3)
    extras["wand_single_p50_runs"] = [
        round(sorted(s)[len(s) // 2], 3) for s in sweeps
    ]

    # ---- ES-parity query surface (bool / phrase / prefix), so regressions
    # on the round-4 paths are visible round-over-round like wand's --------
    from osu_elastic_indexer_spark.operators.boolquery import (
        bool_topk,
        phrase_topk,
        prefix_topk,
    )

    bool_specs = [
        (qid, {"must": q, "must_not": "w00777"}) for qid, q in qs
    ]
    timed("bool_batch20", lambda: bool_topk(spark, idx_dir, bool_specs, 10).count())
    timed(
        "phrase_single",
        lambda: extras.__setitem__(
            "phrase_rows",
            phrase_topk(spark, idx_dir, docs, [(0, "w00100 w00200")], 10).count(),
        ),
    )
    timed(
        "prefix_single",
        lambda: prefix_topk(
            spark, idx_dir, [(0, "w001")], 10, max_expansions=50
        ).count(),
    )

    # ---- positional (v2) layout: build overhead + index-side phrase ------
    # kept in extras (not `queries`) so total_bench_sec stays comparable
    # round-over-round; the v1 index above is untouched
    pos_root = f"/tmp/oei_bench/idx_pos_{n_docs}_{cpus}_{os.getpid()}"
    pos_cat = Catalog(pos_root)
    t0 = time.time()
    pos_manifest = build_index(spark, docs, pos_cat, "bench", positions=True)
    extras["build_pos_sec"] = round(time.time() - t0, 3)
    extras["index_pos_bytes"] = pos_manifest["counters"]["bytes"]
    pos_idx = pos_cat.index_dir("bench")
    ts = []
    for _ in range(2):
        t0 = time.time()
        phrase_topk(
            spark, pos_idx, None, [(0, "w00100 w00200")], 10
        ).count()
        ts.append(round(time.time() - t0, 3))
    extras["phrase_single_pos_sec"] = min(ts)
    extras["phrase_single_pos_runs"] = ts
    ts = []
    for _ in range(2):
        t0 = time.time()
        phrase_topk(
            spark, pos_idx, None, [(0, "the and")], 10, slop=1,
            docpart=False,  # pin the one-task-per-query path for comparison
        ).count()
        ts.append(round(time.time() - t0, 3))
    extras["phrase_stopword_slop_pos_sec"] = min(ts)
    ts = []
    for _ in range(2):
        t0 = time.time()
        phrase_topk(
            spark, pos_idx, None, [(0, "the and")], 10, slop=1, docpart=True
        ).count()
        ts.append(round(time.time() - t0, 3))
    extras["phrase_stopword_slop_pos_docpart_sec"] = min(ts)
    # the DEFAULT (docpart='auto'): df-sum routing should land this
    # head-term phrase on the docpart path without the caller asking
    ts = []
    for _ in range(2):
        t0 = time.time()
        phrase_topk(
            spark, pos_idx, None, [(0, "the and")], 10, slop=1
        ).count()
        ts.append(round(time.time() - t0, 3))
    extras["phrase_stopword_slop_pos_auto_sec"] = min(ts)
    ts = []
    for _ in range(2):
        t0 = time.time()
        phrase_topk(
            spark, pos_idx, None, [(0, "w00100 the")], 10
        ).count()
        ts.append(round(time.time() - t0, 3))
    extras["phrase_rare_common_pos_sec"] = min(ts)
    # serve-tier POSITIONAL phrase (VERDICT r5 #4's serve phrase extra):
    # cold first-touch (block-selected position decode) then hot, on the
    # v2 index; best-of-2 fresh-searcher for the cold figure
    from osu_elastic_indexer_spark.operators.serve import LocalSearcher

    ts = []
    for _ in range(2):
        s2 = LocalSearcher(pos_idx)
        t0 = time.time()
        s2.search_phrase("hash join", None, 10)
        ts.append(round((time.time() - t0) * 1000, 2))
    extras["serve_phrase_cold_ms"] = min(ts)
    t0 = time.time()
    s2.search_phrase("hash join", None, 10)
    extras["serve_phrase_hot_ms"] = round((time.time() - t0) * 1000, 2)
    del s2
    _sh.rmtree(pos_root, ignore_errors=True)

    # ---- serving-tier p50 (no Spark job per query; the ES-analog path) -----
    from osu_elastic_indexer_spark.operators.serve import LocalSearcher

    # same best-of-2-per-query protocol as the wand sampler above, kept
    # COLD (first-touch decode — what previous rounds measured): each sweep
    # gets a FRESH searcher so the postings cache never carries over; the
    # steady-state hot-cache latency is reported separately
    sweeps = []
    for _ in range(2):
        searcher = LocalSearcher(idx_dir)
        searcher.search("zebra", 10)  # JVM-free warm (footer index, norms)
        lat1 = []
        for _qid, q, k in reference_queries():
            t0 = time.time()
            searcher.search(q, k)
            lat1.append(time.time() - t0)
        sweeps.append(lat1)
    lat = sorted(min(a, b) for a, b in zip(*sweeps))
    extras["serve_p50_ms"] = round(lat[len(lat) // 2] * 1000, 2)
    extras["serve_p90_ms"] = round(lat[int(len(lat) * 0.9)] * 1000, 2)
    extras["serve_p50_ms_runs"] = [
        round(sorted(s)[len(s) // 2] * 1000, 2) for s in sweeps
    ]
    # hot path: repeat the sweep on the last searcher (decode cache full)
    lat1 = []
    for _qid, q, k in reference_queries():
        t0 = time.time()
        searcher.search(q, k)
        lat1.append(time.time() - t0)
    lat1.sort()
    extras["serve_hot_p50_ms"] = round(lat1[len(lat1) // 2] * 1000, 2)

    # ---- incremental CDC batch (the queue-consume hot path): evolve ~12%
    # of the corpus and apply one cursor batch — measures tombstone+append,
    # per-batch dictionary DELTA write, exact stats delta, atomic commit ----
    from osu_elastic_indexer_spark.sources.fixtures import evolve_corpus
    from osu_elastic_indexer_spark.streaming.incremental import (
        incremental_update,
    )

    import pyarrow.parquet as _pq

    n_delta = max(200, n_docs // 10)
    evolved_path = f"{root}_delta.parquet"
    _pq.write_table(
        evolve_corpus(
            _pq.read_table(corpus_path),
            n_new=n_delta, n_update=n_delta // 5, n_flip=n_delta // 10,
        ),
        evolved_path,
    )
    t0 = time.time()
    m_inc = incremental_update(
        spark, spark.read.parquet(evolved_path), cat, "bench"
    )
    t_inc = time.time() - t0
    inc_phase = m_inc["phases"].get("incremental_gen1", {})
    extras["incremental_sec"] = round(t_inc, 3)
    extras["incremental_adds"] = inc_phase.get("adds")
    extras["incremental_deletes"] = inc_phase.get("deletes")
    extras["incremental_docs_per_sec"] = round(
        (int(inc_phase.get("adds") or 0) + int(inc_phase.get("deletes") or 0))
        / max(t_inc, 1e-9),
        1,
    )
    os.remove(evolved_path)


    # ---- relational sanity at the sf dir ------------------------------------
    import __spark_entry__ as entry_mod

    for name in ("j1_three_way_join", "a3_counters", "ft_bm25_topk"):
        fn = entry_mod.queries()[name]
        timed(name, lambda fn=fn: fn(spark, sf_dir).collect())

    # fold in the committed scaling-efficiency evidence (bench/scaling.py,
    # the north_rule N-vs-4N artifact) when a recorded run exists
    scaling_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "bench", "scaling_results.json"
    )
    if os.path.exists(scaling_path):
        with open(scaling_path) as f:
            sc = json.load(f)
        extras["scaling_pairs"] = sc.get("pairs")
        extras["scaling_docs"] = next(
            (lv.get("docs") for lv in sc.get("levels", {}).values()), None
        )
        # single-box DRAM correction (measured microbench — BASELINE.md §3.3)
        if sc.get("bandwidth_normalized_eff_1_to_4") is not None:
            extras["scaling_eff_bandwidth_normalized"] = sc[
                "bandwidth_normalized_eff_1_to_4"
            ]

    total = round(sum(queries.values()), 3)
    out = {
        "metric": "total_bench_sec",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "cpus": cpus,
        **extras,
    }
    print(json.dumps(out))
    spark.stop()

    import shutil

    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
