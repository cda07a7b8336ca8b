"""CLI — re-expression of the reference's command surface (SURVEY.md §2.10).

Reference commands (Program.cs:10-13, Commands/IndexCommands.cs,
Commands/QueueCommands.cs) and their analogs here:

  queue watch                         -> build --incremental (cursor loop)
  queue pump-all [--from|--switch]    -> build --full [--resume] [--switch]
  index list                          -> index-list (w/ consistency audit)
  index close|open|delete|nuke        -> same names
  index alias {schema} [--close]      -> alias {schema} [--close]
  schema get/set, active-schemas ...  -> schema-get / schema-set / schemas
  search (delegated to ES)            -> search "query text" [-k 10]

Run with spark-submit (cluster) or plain python (local):
  python -m osu_elastic_indexer_spark.cli build --input docs.parquet \
      --root /tmp/idx --schema v1 --full
"""

from __future__ import annotations

import argparse
import json
import sys


def _spark(args):
    from .session import get_spark

    return get_spark("oei-cli", cores=args.cores)


def cmd_build(args) -> int:
    from .operators.build import build_index
    from .sources.catalog import Catalog
    from .streaming.incremental import backfill_with_switch, incremental_update

    spark = _spark(args)
    cat = Catalog(args.root, alias=args.alias)
    docs = spark.read.parquet(args.input)
    if args.incremental:
        m = incremental_update(spark, docs, cat, args.schema)
    elif args.switch:
        m = backfill_with_switch(spark, docs, docs, cat, args.schema)
    else:
        m = build_index(spark, docs, cat, args.schema, resume=args.resume)
    print(json.dumps({"index": m["index_name"], "counters": m["counters"],
                      "cursor": m["cursor"], "generations": m["generations"]}))
    return 0


def cmd_search(args) -> int:
    from .sources.catalog import Catalog

    cat = Catalog(args.root, alias=args.alias)
    idx = cat.index_dir(args.schema) if args.schema else cat.current_index_dir()
    if args.local:
        # serving path: no Spark session, millisecond latency
        from .operators.serve import LocalSearcher

        res = LocalSearcher(idx).search(args.query, args.k)
        for rank, (doc_id, score) in enumerate(res, 1):
            print(json.dumps({"rank": rank, "doc_id": doc_id, "score": score}))
        return 0
    from .operators.wand import wand_topk_with_urls

    spark = _spark(args)
    rows = (
        wand_topk_with_urls(spark, idx, [(0, args.query)], args.k)
        .orderBy("rank")
        .collect()
    )
    for r in rows:
        print(json.dumps({"rank": r.rank, "doc_id": r.doc_id, "url": r.url,
                          "score": r.score}))
    return 0


def cmd_index_list(args) -> int:
    from .sources.catalog import Catalog

    cat = Catalog(args.root, alias=args.alias)
    for m in cat.list_indices():
        print(json.dumps({
            "index": m["index_name"], "status": m["status"],
            "docs": (m.get("counters") or {}).get("docs"),
            "current": m["is_current"], "active": m["is_active"],
            "consistent": m["consistent"],
        }))
    return 0


def cmd_alias(args) -> int:
    from .sources.catalog import Catalog

    cat = Catalog(args.root, alias=args.alias)
    cat.update_alias(args.schema, close_others=args.close)
    print(json.dumps({"current_schema": cat.get_current_schema()}))
    return 0


def cmd_simple(method: str):
    def run(args) -> int:
        from .sources.catalog import Catalog

        cat = Catalog(args.root, alias=args.alias)
        if method == "schema_get":
            print(json.dumps({"current_schema": cat.get_current_schema(),
                              "active_schemas": cat.get_active_schemas()}))
        elif method == "schema_set":
            cat.set_current_schema(args.schema)
        elif method == "close":
            cat.close_index(args.schema)
        elif method == "open":
            cat.open_index(args.schema)
        elif method == "delete":
            cat.delete_index(args.schema)
        elif method == "nuke":
            cat.nuke_all()
        return 0

    return run


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="oei-spark")
    p.add_argument("--root", default="/tmp/oei_indexes", help="index catalog root")
    p.add_argument("--alias", default="documents")
    p.add_argument("--cores", type=int, default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build or update an index")
    b.add_argument("--input", required=True, help="input parquet path")
    b.add_argument("--schema", required=True)
    b.add_argument("--full", action="store_true", default=True)
    b.add_argument("--resume", action="store_true", help="skip done phases (T8)")
    b.add_argument("--incremental", action="store_true", help="cursor batch (T1/T8)")
    b.add_argument("--switch", action="store_true",
                   help="two-phase cutover: build + catch-up + alias (T9)")
    b.set_defaults(fn=cmd_build)

    s = sub.add_parser("search", help="BM25 top-k over the current index")
    s.add_argument("query")
    s.add_argument("-k", type=int, default=10)
    s.add_argument("--schema", default=None)
    s.add_argument("--local", action="store_true",
                   help="serve from parquet directly (no Spark job)")
    s.set_defaults(fn=cmd_search)

    il = sub.add_parser("index-list", help="list indices + consistency audit")
    il.set_defaults(fn=cmd_index_list)

    al = sub.add_parser("alias", help="atomically repoint the alias")
    al.add_argument("schema")
    al.add_argument("--close", action="store_true")
    al.set_defaults(fn=cmd_alias)

    for name, method in (
        ("schema-get", "schema_get"), ("schema-set", "schema_set"),
        ("close", "close"), ("open", "open"),
        ("delete", "delete"), ("nuke", "nuke"),
    ):
        sp = sub.add_parser(name)
        if method not in ("schema_get", "nuke"):
            sp.add_argument("schema")
        sp.set_defaults(fn=cmd_simple(method))

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
