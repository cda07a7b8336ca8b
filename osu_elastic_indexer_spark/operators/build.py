"""Index build: SPIMI posting construction -> salted term merge -> segments.

The Spark re-expression of the reference's whole write path
(queue pump -> hydrate -> route -> bulk index; IndexQueueProcessor.cs:39-77,
PumpAllScoresCommand.cs:70-110), fused into one declarative pipeline plus the
part the reference delegates to Lucene: building the inverted index itself.

Pipeline (phases are individually checkpointed in the manifest — T8 resume):

  postings   route (P1) -> ONE fused Arrow pass per input partition
             (docID assign + byte-exact html->text + tokenize + per-doc
             combine) -> doc-grouped FORWARD table
             fwd(doc_id, dl, terms[], tfs[]); docmap; dictionary (term_id by
             df-desc dense rank over the JVM-exploded posting view); stats
  segments   explode fwd JVM-side -> ⋈ broadcast dictionary -> RANGE-salt
             head terms over disjoint docID intervals -> groupBy(term_id,
             salt) collect_list+sort_array (all JVM) -> mapInArrow encodes
             each group to delta-gap varbyte blocks with per-block
             (max_tf, min_dl) -> segments parquet range-partitioned by
             term_id
  commit     counters + cursor into the manifest

Skew handling (north_rule "skew handled explicitly"): a head term like 'the'
has df ~ N and would put one reducer group at corpus scale. Each term gets
n_salts = ceil(df / salt_group_cap) salts; salt = doc_id * n_salts / id_span
— RANGE-based, so each salted group covers a disjoint, ordered docID
interval, and the term's global posting list is simply its segment rows
ordered by doc_min. The cap is also the collect_list group memory bound.

Bridge discipline (measured on local[32]): the JVM<->Python Arrow bridge
costs ~0.4us per ROW each way regardless of width, so row-heavy relational
work (explode, join, salt, groupBy, sort) stays JVM-side and Python sees
only doc-grouped or term-grouped rows — 10^5 rows over the bridge instead of
10^7 postings. That single decision is worth ~3x on the whole build.
"""

from __future__ import annotations

import os
from contextlib import contextmanager

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import codec
from ..sources.catalog import Catalog
from .docmap import input_order_offsets

SEGMENT_SCHEMA = (
    "term_id bigint, salt int, generation int, n_docs bigint, "
    "doc_min bigint, doc_max bigint, max_tf bigint, "
    "docs_blob binary, tfs_blob binary, "
    "doc_offs array<bigint>, tf_offs array<bigint>, "
    "block_first array<bigint>, block_last array<bigint>, "
    "block_max_tf array<bigint>, block_min_dl array<bigint>"
)

_SEGMENT_PA_SCHEMA = pa.schema(
    [
        ("term_id", pa.int64()),
        ("salt", pa.int32()),
        ("generation", pa.int32()),
        ("n_docs", pa.int64()),
        ("doc_min", pa.int64()),
        ("doc_max", pa.int64()),
        ("max_tf", pa.int64()),
        ("docs_blob", pa.binary()),
        ("tfs_blob", pa.binary()),
        ("doc_offs", pa.list_(pa.int64())),
        ("tf_offs", pa.list_(pa.int64())),
        ("block_first", pa.list_(pa.int64())),
        ("block_last", pa.list_(pa.int64())),
        ("block_max_tf", pa.list_(pa.int64())),
        ("block_min_dl", pa.list_(pa.int64())),
    ]
)

STATS_SCHEMA = (
    "n_docs bigint, sum_dl bigint, avgdl double, dl_min bigint, "
    "total_postings bigint"
)

# forward index: one row per doc, terms deduped with counts (the per-doc
# combine); doc_id-ordered within partitions by construction
FWD_SCHEMA = "doc_id bigint, dl bigint, terms array<string>, tfs array<bigint>"

_FWD_PA_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("dl", pa.int64()),
        ("terms", pa.list_(pa.string())),
        ("tfs", pa.list_(pa.int64())),
    ]
)


@contextmanager
def arrow_batch_rows(spark, n: int):
    """Scoped override of the Arrow batch size: group-carrying passes want
    small row counts (each row is a whole posting group); narrow passes want
    large ones. The session default (10k) suits blob-per-doc passes."""
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key)
    spark.conf.set(key, str(n))
    try:
        yield
    finally:
        spark.conf.set(key, old)


GROUP_BATCH_ROWS = 256       # rows/batch when each row is a whole group


def _fused_forward_pass(offsets_bc):
    """mapInArrow body over input partitions of (html, __pid): dense docID
    assignment + byte-exact extraction + tokenization + per-doc combine, in
    ONE python pass, emitting doc-GROUPED rows (FWD_SCHEMA) so the return
    bridge carries one row per document, not one per posting."""
    from ..functions.textprep import extract_text, tokenize

    def run(batches):
        local = 0
        offset = None
        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            if offset is None:
                offset = offsets_bc.value[int(batch.column("__pid")[0].as_py())]
            ids = offset + local + np.arange(n, dtype=np.int64)
            local += n
            htmls = batch.column("html")
            doc_ids: list[int] = []
            dls: list[int] = []
            term_offsets = [0]
            flat_terms: list[str] = []
            flat_tfs: list[int] = []
            for i in range(n):
                h = htmls[i].as_py()
                toks = tokenize(extract_text(h))
                dl = len(toks)
                if dl == 0:
                    continue
                counts: dict[str, int] = {}
                for tk in toks:
                    counts[tk] = counts.get(tk, 0) + 1
                doc_ids.append(int(ids[i]))
                dls.append(dl)
                flat_terms.extend(counts.keys())
                flat_tfs.extend(counts.values())
                term_offsets.append(len(flat_terms))
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(doc_ids, pa.int64()),
                    pa.array(dls, pa.int64()),
                    pa.ListArray.from_arrays(
                        pa.array(term_offsets, pa.int32()),
                        pa.array(flat_terms, pa.string()),
                    ),
                    pa.ListArray.from_arrays(
                        pa.array(term_offsets, pa.int32()),
                        pa.array(flat_tfs, pa.int64()),
                    ),
                ],
                schema=_FWD_PA_SCHEMA,
            )

    return run


def _ids_only_pass(offsets_bc):
    """mapInPandas body: the docmap projection of the same partitions
    (url, warc_ts, doc_id) — identical id sequence, html pruned from scan."""

    def run(batches):
        local = 0
        offset = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if offset is None:
                offset = offsets_bc.value[int(pdf["__pid"].iloc[0])]
            ids = offset + local + np.arange(len(pdf), dtype=np.int64)
            local += len(pdf)
            out = pdf.drop(columns=["__pid"]).copy()
            out["doc_id"] = ids
            yield out

    return run


def exploded_postings(fwd: DataFrame) -> DataFrame:
    """fwd -> (doc_id, term, tf, dl) posting view, entirely JVM-side
    (explode of zipped arrays — whole-stage codegen, never Python)."""
    return fwd.select(
        "doc_id",
        "dl",
        F.explode(F.arrays_zip("terms", "tfs")).alias("p"),
    ).select(
        "doc_id",
        F.col("p.terms").alias("term"),
        F.col("p.tfs").cast("bigint").alias("tf"),
        "dl",
    )


SUBSEG_SCHEMA = (
    "term string, salt int, doc_min bigint, doc_max bigint, n_docs bigint, "
    "docs_blob binary, tfs_blob binary"
)

_SUBSEG_PA_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("salt", pa.int32()),
        ("doc_min", pa.int64()),
        ("doc_max", pa.int64()),
        ("n_docs", pa.int64()),
        ("docs_blob", pa.binary()),
        ("tfs_blob", pa.binary()),
    ]
)


def _local_invert_pass(id_span: int, grid_salts: int):
    """mapInArrow body over fwd partitions: the SPIMI local inversion.

    Each partition is inverted IN PYTHON into per-(term, salt-cell) posting
    sub-lists and emitted as compressed sub-segment rows. The term-merge
    shuffle then moves ~|vocab| x |partitions| blob rows instead of one row
    per posting — measured at sf1.6 that is ~1.4M rows / ~0.4 GB instead of
    96M rows / ~4 GB, and the posting-grained shuffle was THE non-scaling
    cost.

    The salt is a FIXED docID grid (cell = doc * grid_salts // id_span),
    applied by CLIPPING each term's postings at cell boundaries here, so a
    (term, salt) merge group covers exactly one disjoint docID interval
    regardless of how the scan packed fwd files into partitions. (Scan
    partitions are NOT contiguous docID ranges — Spark packs small files by
    size — so postings are fully sorted here and merge-sorted again at merge
    time; no ordering assumption survives the file layout.)"""

    def run(batches):
        doc_parts, term_parts, tf_parts = [], [], []
        for batch in batches:
            if batch.num_rows == 0:
                continue
            doc_ids = batch.column("doc_id").to_numpy()
            terms_col = batch.column("terms")
            tfs_col = batch.column("tfs")
            lengths = np.asarray(terms_col.value_lengths())
            doc_parts.append(np.repeat(doc_ids, lengths))
            term_parts.append(terms_col.flatten())
            tf_parts.append(tfs_col.flatten().to_numpy())
        if not doc_parts:
            return
        docs = np.concatenate(doc_parts)
        tfs = np.concatenate(tf_parts)
        terms = pa.concat_arrays(term_parts)  # arrow string array, no objects
        # group by (term, salt-cell), docs sorted within: dictionary-encode
        # the strings (C), then one lexsort
        dict_arr = terms.dictionary_encode()
        codes = dict_arr.indices.to_numpy().astype(np.int64)
        uniq = dict_arr.dictionary  # StringArray of unique terms
        cells = (docs * np.int64(grid_salts)) // np.int64(id_span)
        order = np.lexsort((docs, cells, codes))
        g_docs, g_tfs = docs[order], tfs[order]
        g_codes, g_cells = codes[order], cells[order]
        key = g_codes * np.int64(grid_salts) + g_cells
        bounds = np.flatnonzero(np.diff(key)) + 1
        starts = np.concatenate(([0], bounds))
        ends = np.concatenate((bounds, [key.size]))
        out_terms, out_salt, out_min, out_max, out_n = [], [], [], [], []
        out_db, out_tb = [], []
        for s, e in zip(starts, ends):
            db, tb = codec.encode_plain(g_docs[s:e], g_tfs[s:e])
            out_terms.append(uniq[int(g_codes[s])].as_py())
            out_salt.append(int(g_cells[s]))
            out_min.append(int(g_docs[s]))
            out_max.append(int(g_docs[e - 1]))
            out_n.append(int(e - s))
            out_db.append(db)
            out_tb.append(tb)
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(out_terms, pa.string()),
                pa.array(out_salt, pa.int32()),
                pa.array(out_min, pa.int64()),
                pa.array(out_max, pa.int64()),
                pa.array(out_n, pa.int64()),
                pa.array(out_db, pa.binary()),
                pa.array(out_tb, pa.binary()),
            ],
            schema=_SUBSEG_PA_SCHEMA,
        )

    return run


def _merge_subsegments_arrow(generation: int, norms_path: str, norms_version: int):
    """mapInArrow body over grouped sub-segments (term_id, salt,
    subs: list<struct<doc_min, n_docs, docs_blob, tfs_blob>>):
    decode each sub-list (vectorized), concatenate in doc_min order
    (disjoint ascending partition ranges -> order-safe), encode the final
    block-addressed posting list. block_min_dl metadata comes from the
    doc-indexed norms array (operators/state.load_norms over ``norms_path``'s
    (doc_id, dl) columns) — dl never rides the merge shuffle."""

    def run(batches):
        # absolute import: this body executes on executors (shipped zip)
        from osu_elastic_indexer_spark.operators.state import load_norms

        norms = None
        for batch in batches:
            if batch.num_rows == 0:
                continue
            if norms is None:
                norms = load_norms(norms_path, norms_version)
            tids = batch.column("term_id").to_numpy()
            salts = batch.column("salt").to_numpy()
            subs = batch.column("subs")
            lengths = np.asarray(subs.value_lengths())
            starts = np.zeros(len(lengths) + 1, dtype=np.int64)
            np.cumsum(lengths, out=starts[1:])
            vals = subs.flatten()
            sub_db = vals.field("docs_blob")
            sub_tb = vals.field("tfs_blob")
            cols: dict[str, list] = {n: [] for n in _SEGMENT_PA_SCHEMA.names}
            for i in range(batch.num_rows):
                s, e = int(starts[i]), int(starts[i + 1])
                ds, ts = [], []
                for j in range(s, e):
                    d, t = codec.decode_plain(
                        sub_db[j].as_py(), sub_tb[j].as_py()
                    )
                    ds.append(d)
                    ts.append(t)
                doc = np.concatenate(ds)
                # full merge-sort: sub-blob doc RANGES may interleave (scan
                # partitions are arbitrary file packings), docs never repeat
                order = np.argsort(doc, kind="stable")
                doc = doc[order]
                enc = codec.encode_postings(
                    doc,
                    np.concatenate(ts)[order],
                    norms[doc],
                )
                cols["term_id"].append(int(tids[i]))
                cols["salt"].append(int(salts[i]))
                cols["generation"].append(generation)
                cols["n_docs"].append(enc["n_docs"])
                cols["doc_min"].append(int(doc[0]))
                cols["doc_max"].append(int(doc[-1]))
                cols["max_tf"].append(enc["max_tf"])
                cols["docs_blob"].append(enc["docs_blob"])
                cols["tfs_blob"].append(enc["tfs_blob"])
                cols["doc_offs"].append(enc["doc_offs"].tolist())
                cols["tf_offs"].append(enc["tf_offs"].tolist())
                cols["block_first"].append(enc["block_first"].tolist())
                cols["block_last"].append(enc["block_last"].tolist())
                cols["block_max_tf"].append(enc["block_max_tf"].tolist())
                cols["block_min_dl"].append(enc["block_min_dl"].tolist())
            yield pa.RecordBatch.from_arrays(
                [pa.array(cols[f.name], f.type) for f in _SEGMENT_PA_SCHEMA],
                schema=_SEGMENT_PA_SCHEMA,
            )

    return run


# above this many dictionary rows the tokens⋈dictionary join stops
# broadcasting (a 10^8-term dictionary OOMs driver+executors) and becomes a
# shuffle join — AQE's skew splitting handles head terms
DICT_BROADCAST_MAX = 5_000_000


def build_segments_spimi(
    spark: SparkSession,
    fwd: DataFrame,
    id_span: int,
    salt_group_cap: int,
    norms_path: str,
    norms_version: int,
    generation: int = 0,
    max_salts: int = 1024,
    dictionary: DataFrame | None = None,
    n_terms: int | None = None,
    dict_broadcast_max: int = DICT_BROADCAST_MAX,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """fwd -> (segments, dictionary, sub): local SPIMI inversion,
    blob-grained salted term merge. If ``dictionary`` is given (incremental
    generations), term_ids come from it; otherwise the dictionary is derived
    from the sub-segment stats (df = sum of local n_docs) and returned.

    ``norms_path`` is a parquet table carrying (doc_id, dl) for every doc in
    ``fwd`` (normally the index's fwd table itself) — the merge reads it
    executor-side for block_min_dl metadata (operators/state.load_norms).

    The sub⋈dictionary join broadcasts only below ``dict_broadcast_max``
    rows (pass ``n_terms`` if the caller already counted); above it the join
    is a plain shuffle equi-join — at 10^12-doc scale the dictionary is
    ~10^8 terms and broadcasting it would OOM the cluster.

    Salting: a FIXED docID grid of grid_salts = ceil(id_span /
    salt_group_cap) cells (<= max_salts); the invert pass CLIPS every
    sub-list at cell boundaries, so a (term, salt) merge group covers
    exactly one disjoint interval — each group's decoded size is bounded by
    the docs in one cell (skew bound == memory bound), and a term's final
    segment rows are disjoint ascending ranges (the WAND reader contract)."""
    grid_salts = max(1, min(max_salts, -(-id_span // max(salt_group_cap, 1))))
    # sub-segments are ~index-sized (compressed blobs) — persist so the
    # dictionary derivation and the merge share one inversion pass
    sub = fwd.mapInArrow(
        _local_invert_pass(id_span, grid_salts), SUBSEG_SCHEMA
    ).persist()
    if dictionary is None:
        df_stats = sub.groupBy("term").agg(F.sum("n_docs").alias("df"))
        from .docmap import assign_dense_ids

        dictionary = assign_dense_ids(
            df_stats, [F.desc("df"), F.asc("term")], "term_id"
        ).select("term_id", "term", F.col("df").cast("bigint").alias("df"))
        dictionary = dictionary.persist()
        n_terms = dictionary.count()
    elif n_terms is None:
        n_terms = dictionary.count()
    dict_ids = dictionary.select("term", "term_id")
    if n_terms <= dict_broadcast_max:
        dict_ids = F.broadcast(dict_ids)
    with_ids = sub.join(dict_ids, "term")
    grouped = with_ids.groupBy("term_id", "salt").agg(
        F.collect_list(
            F.struct("docs_blob", "tfs_blob")
        ).alias("subs")
    )
    segments = grouped.mapInArrow(
        _merge_subsegments_arrow(generation, norms_path, norms_version),
        SEGMENT_SCHEMA,
    )
    return segments, dictionary, sub


def build_index(
    spark: SparkSession,
    docs: DataFrame,
    catalog: Catalog,
    schema_version: str,
    *,
    resume: bool = False,
    salt_group_cap: int | None = None,
    segment_partitions: int | None = None,
    where: str | None = None,
    include_all_langs: bool = False,
) -> dict:
    """Full (backfill) index build — the `queue pump-all` + consume analog.

    ``docs`` must have (url, warc_ts, html, text, lang); text is ALWAYS
    re-extracted from html (input_hint byte-identity invariant). Returns the
    final manifest. With resume=True, phases already marked done in the
    manifest are skipped (T8: restart filters done partitions).

    ``where``: user-supplied SQL predicate narrowing the backfill (the
    reference's `pump-all --where`, PumpAllScoresCommand.cs:28,75 — pushed
    into the scan, so a selective predicate prunes IO). ``include_all_langs``
    lifts the lang='en' gate, the analog of `--include-unranked`
    (PumpAllScoresCommand.cs:29) which widens the normally-excluded set.
    """
    from ..session import ship_package

    ship_package(spark)
    cat = catalog
    cat.find_or_create_index(schema_version)
    cat.assert_writable(schema_version)  # T6 stale-builder guard

    docmap_path = cat.table_path(schema_version, "docmap")
    dict_path = cat.table_path(schema_version, "dictionary")
    seg_path = cat.table_path(schema_version, "segments")
    stats_path = cat.table_path(schema_version, "stats")
    # fwd is the doc-grouped forward index (doc -> terms/tfs/dl): the build
    # intermediate, the incremental delete-accounting source (clustered by
    # doc_id by construction), and the compaction input
    fwd_path = cat.table_path(schema_version, "fwd")

    # ---- phase 1: postings (docmap + fwd + dictionary + stats) -------------
    if not (resume and cat.phase_done(schema_version, "postings")):
        cat.mark_phase(schema_version, "postings", "running")
        # P1 routing, split for cost: the cheap half (lang + null checks —
        # parquet def-levels, no blob decode) gates id assignment; the
        # text-emptiness half falls out of the fused pass (dl==0 docs emit
        # no forward row). docmap may thus carry a rare zero-token url —
        # harmless: it has no postings and counters use stats.n_docs.
        pred = F.col("text").isNotNull()
        if not include_all_langs:
            pred = (F.col("lang") == "en") & pred
        adds = docs.filter(pred)
        if where:
            adds = adds.filter(F.expr(where))
        # docIDs in input order (reference-faithful: scores.id is arrival
        # order) — one metadata-cheap count pass, NO shuffle of raw blobs
        part, offsets_bc = input_order_offsets(
            adds.select("url", "warc_ts", "html")
        )
        # generation-0 subdirs: incremental generations append as sibling
        # gen=N dirs and COMMIT via the manifest pointer (atomicity — see
        # sources/catalog.committed_gen_paths)
        fwd = part.select("html", "__pid").mapInArrow(
            _fused_forward_pass(offsets_bc), FWD_SCHEMA
        )
        fwd.write.mode("overwrite").parquet(f"{fwd_path}/gen=0")
        fwd = spark.read.parquet(fwd_path)
        part.select("url", "warc_ts", "__pid").mapInPandas(
            _ids_only_pass(offsets_bc),
            "url string, warc_ts timestamp, doc_id bigint",
        ).write.mode("overwrite").parquet(f"{docmap_path}/gen=0")
        dm = spark.read.parquet(docmap_path)
        agg = dm.agg(
            F.count("*").alias("docs"), F.max("warc_ts").alias("cursor")
        ).collect()[0]
        st = fwd.agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.coalesce(F.sum("dl"), F.lit(0)).cast("bigint").alias("sum_dl"),
            F.coalesce(F.sum("dl") / F.count("*"), F.lit(0.0))
            .cast("double").alias("avgdl"),
            F.coalesce(F.min("dl"), F.lit(0)).cast("bigint").alias("dl_min"),
            F.coalesce(F.sum(F.size("terms")), F.lit(0))
            .cast("bigint").alias("total_postings"),
        ).collect()[0]
        spark.createDataFrame([tuple(st)], STATS_SCHEMA).write.mode(
            "overwrite"
        ).parquet(stats_path)
        cat.mark_phase(
            schema_version, "postings", "done",
            postings=int(st.total_postings), n_docs=int(st.n_docs),
            docs=int(st.n_docs), docmap_rows=int(agg.docs),
            cursor=str(agg.cursor) if agg.cursor is not None else None,
        )

    # ---- phase 2: segments + dictionary -------------------------------------
    if not (resume and cat.phase_done(schema_version, "segments")):
        cat.mark_phase(schema_version, "segments", "running")
        fwd = spark.read.parquet(fwd_path)
        dm = spark.read.parquet(docmap_path)
        max_doc = dm.agg(F.max("doc_id")).collect()[0][0]
        id_span = int(max_doc) + 1 if max_doc is not None else 1
        nparts = segment_partitions or max(
            2, int(spark.conf.get("spark.sql.shuffle.partitions")) // 2
        )
        # adaptive skew cap: the heaviest term (df ~ N) spreads over ~2x the
        # reduce partitions so no single reducer owns a whole head term —
        # this is both the skew fix and the merge-group memory bound
        cap = salt_group_cap or max(50_000, id_span // (2 * nparts))
        norms_ver = int((cat.read_manifest(schema_version) or {}).get("commit_seq", 0))
        segments, dictionary, sub = build_segments_spimi(
            spark, fwd, id_span, cap, fwd_path, norms_ver, generation=0
        )
        dictionary.write.mode("overwrite").parquet(dict_path)
        # sort within the merge's hash partitions by term_id: each output
        # file then has narrow per-row-group term_id ranges, so query-time
        # term_id IN (...) filters prune row groups (the Lucene
        # term-dictionary seek analog) WITHOUT a second shuffle — a
        # repartitionByRange here would range-SAMPLE its child and run the
        # whole merge pipeline twice
        with arrow_batch_rows(spark, GROUP_BATCH_ROWS):
            (
                segments.sortWithinPartitions("term_id", "salt")
                .write.mode("overwrite")
                .parquet(f"{seg_path}/gen=0")
            )
        dictionary.unpersist()
        sub.unpersist()
        seg = spark.read.parquet(seg_path)
        counters = seg.agg(
            F.count("*").alias("rows"),
            F.coalesce(F.sum("n_docs"), F.lit(0)).alias("postings"),
            F.coalesce(
                F.sum(F.length("docs_blob") + F.length("tfs_blob")), F.lit(0)
            ).alias("bytes"),
        ).collect()[0]
        cat.mark_phase(
            schema_version, "segments", "done",
            segment_rows=int(counters.rows),
            postings=int(counters.postings),
            bytes=int(counters.bytes),
        )

    # ---- phase 3: commit ----------------------------------------------------
    m = cat.read_manifest(schema_version)
    m["counters"] = {
        "docs": m["phases"]["postings"].get("docs"),
        "postings": m["phases"]["segments"].get("postings"),
        "bytes": m["phases"]["segments"].get("bytes"),
        "adds_total": m["phases"]["postings"].get("docs"),
        "deletes_total": 0,
    }
    m["cursor"] = m["phases"]["postings"].get("cursor")
    m["generations"] = 1
    cat.write_manifest(schema_version, m)
    cat.mark_phase(schema_version, "commit", "done")
    return cat.read_manifest(schema_version)
