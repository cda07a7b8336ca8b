"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Task-brief component: image/audio/video handled as `binary` columns with
typed metadata; decode / feature-extract / resize / frame-sample run as
Arrow-batched pandas UDFs over mapInPandas. The image/audio codec libraries
are NOT in this container, so the decode kernels are STUBBED behind
``NotImplementedError`` with a clearly-marked deterministic fake — but the
Spark-side plumbing (schema, partitioning, UDF signature, batch shape) is
real and tested against the webtext corpus's html binary column.

Scale notes: binary payloads never pass through Python row-at-a-time — each
mapInPandas batch is one Arrow RecordBatch (spark.sql.execution.arrow.
maxRecordsPerBatch caps its size so a batch of blobs fits executor memory).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

METADATA_SCHEMA = (
    "doc_key string, n_bytes bigint, content_sha256 string, "
    "fake_width int, fake_height int"
)

FRAME_SCHEMA = "doc_key string, frame_idx int, frame_sha256 string"


def decode_image(payload: bytes) -> object:
    """REAL decode would use PIL/libvips — not available in this container."""
    raise NotImplementedError(
        "image decode requires PIL/libvips (not installed); "
        "use fake_decode_meta for deterministic plumbing tests"
    )


def decode_audio(payload: bytes) -> object:
    raise NotImplementedError(
        "audio decode requires soundfile/ffmpeg (not installed)"
    )


def fake_decode_meta(payload: bytes) -> tuple[int, int]:
    """Deterministic stand-in for decoded dimensions: derived from the
    payload hash so tests are stable. CLEARLY A FAKE — swap for decode_image
    when the codec libs exist."""
    h = hashlib.sha256(payload).digest()
    return 1 + h[0] % 64 * 16, 1 + h[1] % 64 * 16


def extract_metadata_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas body: (doc_key string, payload binary) -> METADATA_SCHEMA.
    One Arrow batch in, one out; payloads stay inside the batch."""
    for pdf in batches:
        if len(pdf) == 0:
            continue
        payloads = pdf["payload"]
        widths, heights, shas, sizes = [], [], [], []
        for p in payloads:
            b = bytes(p) if p is not None else b""
            w, h = fake_decode_meta(b)
            widths.append(w)
            heights.append(h)
            shas.append(hashlib.sha256(b).hexdigest())
            sizes.append(len(b))
        yield pd.DataFrame(
            {
                "doc_key": pdf["doc_key"].values,
                "n_bytes": sizes,
                "content_sha256": shas,
                "fake_width": widths,
                "fake_height": heights,
            }
        )


def sample_frames_batches(n_frames: int = 3):
    """mapInPandas factory: (doc_key, payload) -> FRAME_SCHEMA rows, one per
    sampled 'frame' (deterministic byte-slice fakes of a video frame-sample;
    a real implementation replaces the slicing with ffmpeg keyframe pulls)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            keys, idxs, shas = [], [], []
            for key, p in zip(pdf["doc_key"], pdf["payload"]):
                b = bytes(p) if p is not None else b""
                step = max(1, len(b) // max(n_frames, 1))
                for i in range(n_frames):
                    chunk = b[i * step : (i + 1) * step]
                    keys.append(key)
                    idxs.append(i)
                    shas.append(hashlib.sha256(chunk).hexdigest())
            yield pd.DataFrame(
                {"doc_key": keys, "frame_idx": idxs, "frame_sha256": shas}
            )

    return run


def attach_metadata(docs, key_col: str, payload_col: str):
    """DataFrame helper: (key, binary payload) -> metadata table."""
    from pyspark.sql import functions as F

    return docs.select(
        F.col(key_col).cast("string").alias("doc_key"),
        F.col(payload_col).alias("payload"),
    ).mapInPandas(extract_metadata_batches, METADATA_SCHEMA)


def sample_frames(docs, key_col: str, payload_col: str, n_frames: int = 3):
    from pyspark.sql import functions as F

    return docs.select(
        F.col(key_col).cast("string").alias("doc_key"),
        F.col(payload_col).alias("payload"),
    ).mapInPandas(sample_frames_batches(n_frames), FRAME_SCHEMA)
