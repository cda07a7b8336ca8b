"""CLI surface round-trips (SURVEY.md §2.10): enqueue -> watch -> searchable,
single-doc pump/delete, queue gauge + clear, and `build --where`."""

import json

import pytest

from osu_elastic_indexer_spark import cli


def _run(capsys, argv) -> list[dict]:
    assert cli.main(argv) == 0
    out = capsys.readouterr().out.strip()
    return [json.loads(line) for line in out.splitlines() if line.strip()]


@pytest.fixture(scope="module")
def env(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    return {"root": str(d / "idx"), "queue": str(d / "queue")}


def test_cli_queue_roundtrip(spark, env, capsys):
    root, queue = env["root"], env["queue"]
    base = ["--root", root]
    # pump-score analog: enqueue three docs, drain the queue -> index built
    for i, text in enumerate(
        ["alpha bravo charlie", "alpha delta", "echo foxtrot cliword"]
    ):
        _run(capsys, base + [
            "queue-push-doc", "--queue-dir", queue,
            "--url", f"u{i}", "--text", text,
        ])
    out = _run(capsys, base + [
        "queue-watch", "--queue-dir", queue, "--schema", "v1",
    ])[0]
    assert out["counters"]["docs"] == 3
    assert out["queue"]["files_pending"] == 0  # drained
    hits = _run(capsys, base + [
        "search", "cliword", "--schema", "v1", "-k", "5",
    ])
    assert [h["url"] for h in hits] == ["u2"]
    # serving path agrees (same index, no Spark)
    local = _run(capsys, base + [
        "search", "cliword", "--schema", "v1", "--local", "-k", "5",
    ])
    assert [h["doc_id"] for h in local] == [h["doc_id"] for h in hits]
    # ES bool-query surface: must + must_not, Spark and serving paths agree
    bool_hits = _run(capsys, base + [
        "search", "--schema", "v1", "--must", "alpha",
        "--must-not", "delta", "-k", "5",
    ])
    bool_local = _run(capsys, base + [
        "search", "--schema", "v1", "--local", "--must", "alpha",
        "--must-not", "delta", "-k", "5",
    ])
    # u0 has alpha w/o delta; u1 has alpha+delta (excluded); u2 no alpha
    assert len(bool_hits) == 1
    assert [h["doc_id"] for h in bool_local] == [h["doc_id"] for h in bool_hits]
    # ES prefix-query surface: 'cl' expands to cliword (only u2 matches)
    px = _run(capsys, base + [
        "search", "--schema", "v1", "--prefix", "cl", "-k", "5",
    ])
    px_local = _run(capsys, base + [
        "search", "--schema", "v1", "--local", "--prefix", "cl", "-k", "5",
    ])
    assert len(px) == 1
    assert [h["doc_id"] for h in px_local] == [h["doc_id"] for h in px]

    # update one doc + delete another, drain, verify both took effect
    _run(capsys, base + [
        "queue-push-doc", "--queue-dir", queue,
        "--url", "u0", "--text", "alpha bravo cliword",
    ])
    _run(capsys, base + [
        "queue-push-doc", "--queue-dir", queue, "--url", "u2", "--delete",
    ])
    out = _run(capsys, base + [
        "queue-watch", "--queue-dir", queue, "--schema", "v1",
    ])[0]
    assert out["counters"]["docs"] == 2
    assert out["counters"]["deletes_total"] >= 2  # u0 old rev + u2
    hits = _run(capsys, base + [
        "search", "cliword", "--schema", "v1", "-k", "5",
    ])
    assert [h["url"] for h in hits] == ["u0"]  # new revision; u2 deleted

    # gauge + clear: a pushed-but-unconsumed doc is pending, clear drops it
    _run(capsys, base + [
        "queue-push-doc", "--queue-dir", queue, "--url", "u9", "--text", "zz",
    ])
    depth = _run(capsys, base + [
        "queue-depth", "--queue-dir", queue, "--schema", "v1",
    ])[0]
    assert depth["files_pending"] >= 1 and depth["rows_pending"] >= 1
    removed = _run(capsys, base + ["queue-clear", "--queue-dir", queue])[0]
    assert removed["removed_files"] >= 1
    depth = _run(capsys, base + ["queue-depth", "--queue-dir", queue])[0]
    assert depth["files_total"] == 0

    # counters surfaced by index-list (A2/U2 wiring)
    listing = _run(capsys, base + ["index-list"])
    row = [r for r in listing if r["index"] == "documents_v1"][0]
    assert row["docs"] == 2 and row["adds_total"] >= 4
    assert row["queue_pending"] == 0


def test_cli_build_where_narrows_backfill(spark, env, capsys, tmp_path):
    from osu_elastic_indexer_spark.sources.fixtures import write_corpus

    corpus = write_corpus(str(tmp_path / "c.parquet"), 300)
    root = str(tmp_path / "idx")
    full = _run(capsys, [
        "--root", root, "build", "--input", corpus, "--schema", "vfull",
    ])[0]
    narrowed = _run(capsys, [
        "--root", root, "build", "--input", corpus, "--schema", "vwhere",
        "--where", "url LIKE '%0'",
    ])[0]
    assert 0 < narrowed["counters"]["docs"] < full["counters"]["docs"]

def test_cli_positional_build_and_sourceless_phrase(
    spark, corpus_path, tmp_path, capsys
):
    """`build --positions` then `search --phrase` WITHOUT --source, on both
    the Spark and --local tiers; a positions-free index still demands
    --source with a pointed error."""
    root = str(tmp_path / "posidx")
    base = ["--root", root]
    _run(capsys, base + [
        "build", "--input", corpus_path, "--schema", "v1", "--positions",
    ])
    _run(capsys, base + ["alias", "v1"])
    hits = _run(capsys, base + ["search", "--phrase", "the and", "-k", "5"])
    local = _run(capsys, base + [
        "search", "--phrase", "the and", "-k", "5", "--local",
    ])
    assert hits and [
        (h["doc_id"], round(h["score"], 6)) for h in hits
    ] == [(h["doc_id"], round(h["score"], 6)) for h in local]
    sloppy = _run(capsys, base + [
        "search", "--phrase", "and the", "-k", "5", "--slop", "2",
    ])
    assert sloppy  # transposition admitted at slop 2
    # positions-free index: same call refuses with the --source hint
    root2 = str(tmp_path / "plainidx")
    _run(capsys, ["--root", root2, "build", "--input", corpus_path,
                  "--schema", "v1"])
    _run(capsys, ["--root", root2, "alias", "v1"])
    with pytest.raises(SystemExit, match="positions"):
        cli.main(["--root", root2, "search", "--phrase", "the and"])


def test_cli_filter_term(spark, corpus_path, tmp_path, capsys):
    """`build --include-all-langs` (lang auto-declared as a keyword field)
    then `search --must ... --filter-term lang=de` on the Spark and
    --local tiers; repeated flags on one field = ES terms (ANY);
    undeclared fields refused with a pointed error."""
    root = str(tmp_path / "ftidx")
    base = ["--root", root]
    m = _run(capsys, base + [
        "build", "--input", corpus_path, "--schema", "v1",
        "--include-all-langs",
    ])[0]
    _run(capsys, base + ["alias", "v1"])
    qa = ["search", "--must", "the", "--filter-term", "lang=de", "-k", "5"]
    hits = _run(capsys, base + qa)
    local = _run(capsys, base + qa + ["--local"])
    assert hits
    assert [h["doc_id"] for h in local] == [h["doc_id"] for h in hits]
    both = _run(capsys, base + [
        "search", "--must", "the", "--filter-term", "lang=de",
        "--filter-term", "lang=fr", "-k", "50",
    ])
    assert {h["doc_id"] for h in hits} <= {h["doc_id"] for h in both}
    with pytest.raises(ValueError, match="filter_term"):
        cli.main(base + [
            "search", "--must", "the", "--filter-term", "country=de",
        ])
    with pytest.raises(SystemExit, match="FIELD=VALUE"):
        cli.main(base + ["search", "--must", "the", "--filter-term", "de"])


def test_cli_sort_and_boost(spark, corpus_path, tmp_path, capsys):
    """`build --numeric-field` declares a docmap doc-value column; `search
    --sort FIELD [--sort-asc] [--filter-term] [--filter-range]` runs the
    ES sort query on the Spark and --local tiers (identical rows), and
    the Lucene caret syntax (`term^2.5`) boosts scored clauses."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pq.read_table(corpus_path)
    tbl = tbl.append_column(
        "page_bytes",
        pa.array([float(len(h)) for h in tbl["html"].to_pylist()]),
    )
    inp = str(tmp_path / "docs_num.parquet")
    pq.write_table(tbl, inp)
    root = str(tmp_path / "sortidx")
    base = ["--root", root]
    m = _run(capsys, base + [
        "build", "--input", inp, "--schema", "v1",
        "--include-all-langs", "--numeric-field", "page_bytes",
    ])[0]
    assert m["counters"]["docs"] > 0
    _run(capsys, base + ["alias", "v1"])
    qa = [
        "search", "--sort", "page_bytes", "-k", "5",
        "--filter-term", "lang=en",
        "--filter-range", "page_bytes", "400", "null",
    ]
    hits = _run(capsys, base + qa)
    local = _run(capsys, base + qa + ["--local"])
    assert hits and [h["doc_id"] for h in local] == [h["doc_id"] for h in hits]
    assert [h["page_bytes"] for h in local] == [h["page_bytes"] for h in hits]
    vals = [h["page_bytes"] for h in hits]
    assert vals == sorted(vals, reverse=True) and min(vals) >= 400
    asc = _run(capsys, base + qa + ["--sort-asc", "--local"])
    assert [h["page_bytes"] for h in asc] == sorted(
        v for v in [h["page_bytes"] for h in asc]
    )
    # caret boost: same clause terms, boosted ordering may differ but the
    # Spark and serve tiers must agree with each other
    qb = ["search", "--must", "the", "--should", "zebra^3", "-k", "5"]
    bh = _run(capsys, base + qb)
    bl = _run(capsys, base + qb + ["--local"])
    assert bh and [
        (h["doc_id"], round(h["score"], 9)) for h in bl
    ] == [(h["doc_id"], round(h["score"], 9)) for h in bh]
    # --sort is its own mode: scored clauses alongside it are refused
    with pytest.raises(SystemExit, match="exactly one"):
        cli.main(base + ["search", "--sort", "page_bytes", "--must", "the"])
    # ES aggregations: terms buckets + numeric stats, Spark and --local
    ta = ["search", "--terms-agg", "lang", "-k", "3"]
    th = _run(capsys, base + ta)
    tl = _run(capsys, base + ta + ["--local"])
    assert th == tl and th and all("doc_count" in h for h in th)
    assert [h["doc_count"] for h in th] == sorted(
        (h["doc_count"] for h in th), reverse=True
    )
    sa = ["search", "--stats-agg", "page_bytes",
          "--filter-term", "lang=en"]
    sh = _run(capsys, base + sa)[0]
    sl = _run(capsys, base + sa + ["--local"])[0]
    assert sh["cnt"] == sl["cnt"] > 0
    assert abs(sh["sum_v"] - sl["sum_v"]) < 1e-6
