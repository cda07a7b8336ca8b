"""Index build: SPIMI posting construction -> salted term merge -> segments.

The Spark re-expression of the reference's whole write path
(queue pump -> hydrate -> route -> bulk index; IndexQueueProcessor.cs:39-77,
PumpAllScoresCommand.cs:70-110), fused into one declarative pipeline plus the
part the reference delegates to Lucene: building the inverted index itself.

Pipeline (phases are individually checkpointed in the manifest — T8 resume):

  docmap     route (P1) -> extract text from html (pandas UDF) ->
             dense docIDs (range partition, no global sort) -> docmap parquet
  postings   docmap ⋈ input (S3 re-hydration by key) -> tokenize + map-side
             combine (one row per (doc, term)) -> tf parquet; dictionary
             (term_id by df-desc dense rank); collection stats
  segments   tf ⋈ dictionary (broadcast at small scale) -> RANGE-salt head
             terms over disjoint docID intervals -> shuffle on
             (term_id, salt) -> applyInPandas: sort by doc_id, delta-gap
             varbyte encode with per-block (max_tf, min_dl) -> segments
             parquet range-partitioned by term_id
  commit     counters + cursor into the manifest

Skew handling (north_rule "skew handled explicitly"): a head term like 'the'
has df ~ N and would put one reducer group at corpus scale. Each term gets
n_salts = ceil(df / salt_group_cap) salts; salt = doc_id * n_salts / id_span
— RANGE-based, so each salted group covers a disjoint, ordered docID
interval, and the term's global posting list is simply its segment rows
ordered by doc_min. No second merge pass is required for query correctness;
`compact generations` (incremental path) uses codec.merge_encoded.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import codec
from ..sources.catalog import Catalog
from .dictionary import build_dictionary, encode_terms
from .docmap import ranged_with_offsets
from .routing import split_batch
from .search import TF_SCHEMA

SEGMENT_SCHEMA = (
    "term_id bigint, salt int, generation int, n_docs bigint, "
    "doc_min bigint, doc_max bigint, max_tf bigint, "
    "docs_blob binary, tfs_blob binary, dls_blob binary, "
    "doc_offs array<bigint>, tf_offs array<bigint>, dl_offs array<bigint>, "
    "block_first array<bigint>, block_last array<bigint>, "
    "block_max_tf array<bigint>, block_min_dl array<bigint>"
)

STATS_SCHEMA = (
    "n_docs bigint, sum_dl bigint, avgdl double, dl_min bigint, "
    "total_postings bigint"
)


def _fused_postings_pass(offsets_bc):
    """mapInPandas body over url-ranged partitions of (url, warc_ts, html,
    __pid): dense docID assignment + byte-exact html->text extraction +
    tokenization + per-doc term-count combine, in ONE python pass.

    Output: TF_SCHEMA rows (doc_id, term, tf, dl)."""
    from ..functions.textprep import extract_text, tokenize

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
            out_doc: list[int] = []
            out_term: list[str] = []
            out_tf: list[int] = []
            out_dl: list[int] = []
            for doc_id, html in zip(ids, pdf["html"].values):
                toks = tokenize(extract_text(html))
                dl = len(toks)
                if dl == 0:
                    continue
                counts: dict[str, int] = {}
                for tk in toks:
                    counts[tk] = counts.get(tk, 0) + 1
                out_doc.extend([doc_id] * len(counts))
                out_term.extend(counts.keys())
                out_tf.extend(counts.values())
                out_dl.extend([dl] * len(counts))
            yield pd.DataFrame(
                {"doc_id": out_doc, "term": out_term, "tf": out_tf, "dl": out_dl}
            )

    return run


def _ids_only_pass(offsets_bc):
    """mapInPandas body: the docmap projection of the same ranged partitions
    (url, warc_ts, doc_id) — identical id sequence, no html decode."""

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


def _encode_partition(generation: int):
    """mapInPandas body over a partition pre-sorted by (term_id, salt,
    doc_id): encode each contiguous (term_id, salt) run into one segment row.

    This is the SPIMI merge proper: the shuffle delivered every (term, salt)
    group to one partition; one vectorized pass over the sorted stream emits
    compressed posting lists — no per-group python-function dispatch (a
    groupBy().applyInPandas here costs ~10ms of pandas overhead per TERM,
    which at 10^8 terms is the whole job)."""

    def encode(batches):
        cols = [
            "term_id", "salt", "generation", "n_docs", "doc_min", "doc_max",
            "max_tf", "docs_blob", "tfs_blob", "dls_blob", "doc_offs",
            "tf_offs", "dl_offs", "block_first", "block_last",
            "block_max_tf", "block_min_dl",
        ]
        out: dict[str, list] = {c: [] for c in cols}
        pend: pd.DataFrame | None = None

        def emit(g: pd.DataFrame) -> None:
            doc_ids = g["doc_id"].values
            enc = codec.encode_postings(doc_ids, g["tf"].values, g["dl"].values)
            out["term_id"].append(int(g["term_id"].iloc[0]))
            out["salt"].append(int(g["salt"].iloc[0]))
            out["generation"].append(generation)
            out["n_docs"].append(enc["n_docs"])
            out["doc_min"].append(int(doc_ids[0]))
            out["doc_max"].append(int(doc_ids[-1]))
            out["max_tf"].append(enc["max_tf"])
            out["docs_blob"].append(enc["docs_blob"])
            out["tfs_blob"].append(enc["tfs_blob"])
            out["dls_blob"].append(enc["dls_blob"])
            out["doc_offs"].append(enc["doc_offs"].tolist())
            out["tf_offs"].append(enc["tf_offs"].tolist())
            out["dl_offs"].append(enc["dl_offs"].tolist())
            out["block_first"].append(enc["block_first"].tolist())
            out["block_last"].append(enc["block_last"].tolist())
            out["block_max_tf"].append(enc["block_max_tf"].tolist())
            out["block_min_dl"].append(enc["block_min_dl"].tolist())

        def drain() -> pd.DataFrame:
            pdf = pd.DataFrame(out)
            for c in cols:
                out[c] = []
            return pdf

        for pdf in batches:
            if len(pdf) == 0:
                continue
            if pend is not None:
                pdf = pd.concat([pend, pdf], ignore_index=True)
                pend = None
            key = (
                pdf["term_id"].values.astype(np.int64) << np.int64(16)
            ) | pdf["salt"].values.astype(np.int64)
            bounds = np.flatnonzero(np.diff(key)) + 1
            starts = np.concatenate(([0], bounds))
            ends = np.concatenate((bounds, [len(pdf)]))
            # the last run may continue into the next Arrow batch — hold it
            for s, e in zip(starts[:-1], ends[:-1]):
                emit(pdf.iloc[s:e])
            pend = pdf.iloc[starts[-1] :]
            if len(out["term_id"]) >= 512:
                yield drain()
        if pend is not None and len(pend):
            emit(pend)
        if out["term_id"]:
            yield drain()

    return encode


def encode_segments(
    encoded_tf: DataFrame,
    dictionary: DataFrame,
    id_span: int,
    salt_group_cap: int = 1_000_000,
    max_salts: int = 1024,
    generation: int = 0,
    num_partitions: int | None = None,
) -> DataFrame:
    """(term_id, doc_id, tf, dl) -> segment rows, with explicit range salting.

    ``id_span`` = max doc_id + 1 (the docID universe for this generation);
    salts partition [0, id_span) into contiguous intervals so each group's
    postings form a sorted, disjoint slice of the term's global list.
    max_salts fits the (term_id << 16 | salt) run key in _encode_partition.
    """
    assert max_salts <= (1 << 16)
    with_df = encoded_tf.join(
        F.broadcast(dictionary.select("term_id", "df")), "term_id"
    )
    n_salts = F.least(
        F.lit(max_salts),
        F.ceil(F.col("df") / F.lit(salt_group_cap)).cast("int"),
    )
    salted = with_df.withColumn(
        "salt",
        ((F.col("doc_id") * n_salts) / F.lit(id_span)).cast("int"),
    ).select("term_id", "salt", "doc_id", "tf", "dl")
    spark = encoded_tf.sparkSession
    nparts = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    part = salted.repartition(nparts, "term_id", "salt").sortWithinPartitions(
        "term_id", "salt", "doc_id"
    )
    return part.mapInPandas(_encode_partition(generation), schema=SEGMENT_SCHEMA)


def build_index(
    spark: SparkSession,
    docs: DataFrame,
    catalog: Catalog,
    schema_version: str,
    *,
    resume: bool = False,
    salt_group_cap: int = 1_000_000,
    segment_partitions: int | None = None,
) -> dict:
    """Full (backfill) index build — the `queue pump-all` + consume analog.

    ``docs`` must have (url, warc_ts, html, text, lang); text is ALWAYS
    re-extracted from html (input_hint byte-identity invariant). Returns the
    final manifest. With resume=True, phases already marked done in the
    manifest are skipped (T8: restart filters done partitions).
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
    # tf is kept as a real table: it is the forward index (doc -> terms),
    # clustered by doc_id, which makes delete accounting in incremental
    # updates a pruned scan (streaming/incremental.py)
    tf_path = cat.table_path(schema_version, "tf")
    doclens_path = cat.table_path(schema_version, "doclens")

    # ---- phase 1: postings (docmap + tf + dictionary + stats) --------------
    # One pass: html rides the docID range shuffle ONCE; extract + tokenize
    # run on the id-assigned partitions, so the tf forward table inherits
    # doc_id clustering for free (each output partition covers a contiguous
    # docID range — the incremental delete accounting relies on that).
    # Deliberately NOT re-clustered with repartitionByRange: range exchange
    # samples its child, which would recompute the whole extract+tokenize
    # pipeline a second time (measured 2x the phase cost at sf0.1).
    if not (resume and cat.phase_done(schema_version, "postings")):
        cat.mark_phase(schema_version, "postings", "running")
        adds, _dels = split_batch(docs)
        part, offsets_bc = ranged_with_offsets(
            adds.select("url", "warc_ts", "html"), ["url"]
        )
        # ONE python stage: id-assign + html->text + tokenize + map-side
        # combine, fused (chained pandas-UDF stages each spawn a python
        # worker per task — 3 chained stages at 32 cores = 96 concurrent
        # python processes, which measurably inverts scaling)
        tf = part.mapInPandas(_fused_postings_pass(offsets_bc), TF_SCHEMA)
        tf.write.mode("overwrite").parquet(tf_path)
        tf = spark.read.parquet(tf_path)
        # docmap: same partitions, ids only (html never decoded here)
        part.select("url", "warc_ts", "__pid").mapInPandas(
            _ids_only_pass(offsets_bc), "url string, warc_ts timestamp, doc_id bigint"
        ).write.mode("overwrite").parquet(docmap_path)
        part.unpersist()
        dm = spark.read.parquet(docmap_path)
        agg = dm.agg(
            F.count("*").alias("docs"), F.max("warc_ts").alias("cursor")
        ).collect()[0]
        build_dictionary(tf).write.mode("overwrite").parquet(dict_path)
        dl = tf.groupBy("doc_id").agg(F.max("dl").alias("dl"))
        dl.write.mode("overwrite").parquet(doclens_path)
        dl = spark.read.parquet(doclens_path)
        stats = dl.agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("dl").cast("bigint").alias("sum_dl"),
            (F.sum("dl") / F.count("*")).cast("double").alias("avgdl"),
            F.min("dl").cast("bigint").alias("dl_min"),
        ).crossJoin(tf.agg(F.count("*").cast("bigint").alias("total_postings")))
        stats.write.mode("overwrite").parquet(stats_path)
        st = spark.read.parquet(stats_path).collect()[0]
        cat.mark_phase(
            schema_version, "postings", "done",
            postings=int(st.total_postings), n_docs=int(st.n_docs),
            docs=int(agg.docs), cursor=str(agg.cursor),
        )

    # ---- phase 3: segments -------------------------------------------------
    if not (resume and cat.phase_done(schema_version, "segments")):
        cat.mark_phase(schema_version, "segments", "running")
        tf = spark.read.parquet(tf_path)
        dictionary = spark.read.parquet(dict_path)
        dm = spark.read.parquet(docmap_path)
        id_span = int(dm.agg(F.max("doc_id")).collect()[0][0]) + 1
        enc_tf = encode_terms(tf, dictionary)
        segments = encode_segments(
            enc_tf, dictionary, id_span,
            salt_group_cap=salt_group_cap, generation=0,
        )
        nparts = segment_partitions or max(
            2, int(spark.conf.get("spark.sql.shuffle.partitions")) // 2
        )
        # range-partition + sort by term_id: row-group pruning for query-time
        # term_id IN (...) filters (the Lucene term-dictionary seek analog)
        (
            segments.repartitionByRange(nparts, "term_id")
            .sortWithinPartitions("term_id", "salt")
            .write.mode("overwrite")
            .parquet(seg_path)
        )
        seg = spark.read.parquet(seg_path)
        counters = seg.agg(
            F.count("*").alias("rows"),
            F.sum("n_docs").alias("postings"),
            F.sum(
                F.length("docs_blob") + F.length("tfs_blob") + F.length("dls_blob")
            ).alias("bytes"),
        ).collect()[0]
        cat.mark_phase(
            schema_version, "segments", "done",
            segment_rows=int(counters.rows),
            postings=int(counters.postings),
            bytes=int(counters.bytes),
        )

    # ---- phase 4: commit ---------------------------------------------------
    m = cat.read_manifest(schema_version)
    m["counters"] = {
        "docs": m["phases"]["postings"].get("docs"),
        "postings": m["phases"]["segments"].get("postings"),
        "bytes": m["phases"]["segments"].get("bytes"),
    }
    m["cursor"] = m["phases"]["postings"].get("cursor")
    m["generations"] = 1
    cat.write_manifest(schema_version, m)
    cat.mark_phase(schema_version, "commit", "done")
    return cat.read_manifest(schema_version)
