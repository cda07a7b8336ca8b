"""Scaling-efficiency evidence (north_rule, sandbox form).

The rule's criterion — ">=0.8 throughput scaling efficiency between N and 4N
executors" — cannot use a real cluster in this sandbox; per the task brief it
is evidenced by running the SAME build job at two parallelism levels
(local[8] vs local[32]) on identical input and reporting throughput at both
plus eff = thr(4N) / (4 * thr(N)).

Usage:  python bench/scaling.py [n_docs]      (default 100000)
Writes a markdown row set to stdout; paste/commit into BASELINE.md §3.

Each level runs in its own SparkSession (stopped between) with shuffle
partitions matched to cores — the same conf a spark-submit would ship.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import corpus_for_sf  # noqa: E402


def run_level(cores: int, corpus_path: str, tag: str) -> dict:
    from osu_elastic_indexer_spark.operators.build import build_index
    from osu_elastic_indexer_spark.operators.wand import wand_topk
    from osu_elastic_indexer_spark.session import get_spark
    from osu_elastic_indexer_spark.sources.catalog import Catalog
    from osu_elastic_indexer_spark.sources.fixtures import reference_queries

    spark = get_spark(f"scaling-{cores}", cores=cores)
    root = f"/tmp/oei_bench/scal_{tag}_{cores}_{os.getpid()}"
    cat = Catalog(root)
    docs = spark.read.parquet(corpus_path)
    t0 = time.time()
    manifest = build_index(spark, docs, cat, "bench")
    t_build = time.time() - t0
    n = manifest["counters"]["docs"]
    qs = [(qid, q) for qid, q, _k in reference_queries()]
    t0 = time.time()
    wand_topk(spark, cat.index_dir("bench"), qs, 10).count()
    t_wand = time.time() - t0
    spark.stop()
    import shutil

    shutil.rmtree(root, ignore_errors=True)
    return {
        "cores": cores,
        "docs": n,
        "build_sec": round(t_build, 2),
        "docs_per_sec": round(n / t_build, 1),
        "wand_batch20_sec": round(t_wand, 2),
    }


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    corpus_path, n_docs = corpus_for_sf(n_docs / 1_000_000)
    lo = run_level(8, corpus_path, "lo")
    hi = run_level(32, corpus_path, "hi")
    eff = hi["docs_per_sec"] / (4 * lo["docs_per_sec"])
    out = {"N": lo, "fourN": hi, "scaling_efficiency": round(eff, 3)}
    print(json.dumps(out))
    print(
        f"\n| level | cores | docs | build sec | docs/sec | wand batch20 sec |\n"
        f"|---|---|---|---|---|---|\n"
        f"| N | 8 | {lo['docs']} | {lo['build_sec']} | {lo['docs_per_sec']} | {lo['wand_batch20_sec']} |\n"
        f"| 4N | 32 | {hi['docs']} | {hi['build_sec']} | {hi['docs_per_sec']} | {hi['wand_batch20_sec']} |\n"
        f"\nscaling efficiency = {hi['docs_per_sec']}/(4×{lo['docs_per_sec']}) = {eff:.3f}"
    )


if __name__ == "__main__":
    main()
