"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Task-brief component: image/audio/video handled as `binary` columns with
typed metadata; decode / feature-extract / resize / frame-sample run as
Arrow-batched pandas UDFs over mapInPandas.

Two decode kernels are REAL, pure-stdlib+numpy (no codec libs needed):
RIFF/WAVE PCM audio (``decode_audio`` via the stdlib ``wave`` module) and
binary netpbm rasters (``decode_image`` for P5 PGM / P6 PPM). Every other
format (PNG/JPEG/ffmpeg-land) still raises ``NotImplementedError`` behind a
try-import — the container has no codec libraries — with the deterministic
fake kept for plumbing tests. The Spark-side plumbing (schema,
partitioning, UDF signature, batch shape) is identical for real and stub
kernels and is tested against both.

Scale notes: binary payloads never pass through Python row-at-a-time — each
mapInPandas batch is one Arrow RecordBatch (spark.sql.execution.arrow.
maxRecordsPerBatch caps its size so a batch of blobs fits executor memory).
"""

from __future__ import annotations

import hashlib
import io
from collections.abc import Iterator

import numpy as np
import pandas as pd

METADATA_SCHEMA = (
    "doc_key string, n_bytes bigint, content_sha256 string, "
    "fake_width int, fake_height int"
)

FRAME_SCHEMA = "doc_key string, frame_idx int, frame_sha256 string"

IMAGE_META_SCHEMA = (
    "doc_key string, width int, height int, maxval int, channels int, "
    "mean_luma double"
)

AUDIO_FEATURES_SCHEMA = (
    "doc_key string, sample_rate int, channels int, n_samples bigint, "
    "duration_s double, rms double, peak double"
)


def decode_image(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    """Decode a raster image -> (width, height, maxval, pixels).

    REAL for binary netpbm (P5 grayscale / P6 RGB): pure-python header
    parse (whitespace + '#' comments per the spec) and a zero-copy
    ``np.frombuffer`` of the sample plane — uint8 when maxval < 256,
    big-endian uint16 otherwise. ``pixels`` is (height, width) for P5 and
    (height, width, 3) for P6. Other formats raise: PNG/JPEG need PIL or
    libvips, which this container does not ship."""
    if payload[:2] in (b"P5", b"P6"):
        fields: list[int] = []
        i = 2
        while len(fields) < 3:
            if i >= len(payload):
                raise ValueError("truncated netpbm header")
            c = payload[i : i + 1]
            if c == b"#":  # comment runs to end of line
                i = payload.index(b"\n", i) + 1
            elif c.isspace():
                i += 1
            else:
                j = i
                while j < len(payload) and not payload[j : j + 1].isspace():
                    j += 1
                fields.append(int(payload[i:j]))
                i = j
        i += 1  # single whitespace after maxval, then raw samples
        width, height, maxval = fields
        channels = 3 if payload[:2] == b"P6" else 1
        dtype = np.dtype(">u2") if maxval > 255 else np.dtype(np.uint8)
        n_vals = width * height * channels
        pixels = np.frombuffer(
            payload, dtype=dtype, count=n_vals, offset=i
        )
        shape = (height, width, 3) if channels == 3 else (height, width)
        return width, height, maxval, pixels.reshape(shape)
    try:
        import PIL.Image  # noqa: F401  (absent in this container)
    except ImportError:
        raise NotImplementedError(
            "image decode beyond netpbm (P5/P6) requires PIL/libvips "
            "(not installed); use fake_decode_meta for plumbing tests"
        ) from None
    img = PIL.Image.open(io.BytesIO(payload))
    arr = np.asarray(img)
    return img.width, img.height, 255, arr


def decode_audio(payload: bytes) -> dict:
    """Decode audio -> {sample_rate, channels, sample_width, n_samples,
    duration_s, samples}.

    REAL for RIFF/WAVE PCM via the stdlib ``wave`` module: samples come
    back as an (n_frames, channels) numpy array (uint8 for 8-bit, int16 /
    int32 for 16/32-bit). Compressed formats raise — soundfile/ffmpeg are
    not in this container."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise NotImplementedError(
            "audio decode beyond RIFF/WAVE PCM requires soundfile/ffmpeg "
            "(not installed)"
        )
    import wave

    with wave.open(io.BytesIO(payload), "rb") as w:
        sw, ch, sr, nf = (
            w.getsampwidth(),
            w.getnchannels(),
            w.getframerate(),
            w.getnframes(),
        )
        raw = w.readframes(nf)
    dtype = {1: np.uint8, 2: np.dtype("<i2"), 4: np.dtype("<i4")}.get(sw)
    if dtype is None:
        raise NotImplementedError(f"unsupported PCM sample width {sw}")
    samples = np.frombuffer(raw, dtype=dtype).reshape(-1, ch)
    return {
        "sample_rate": sr,
        "channels": ch,
        "sample_width": sw,
        "n_samples": samples.shape[0],
        "duration_s": samples.shape[0] / sr if sr else 0.0,
        "samples": samples,
    }


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


def extract_image_meta_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas body over REAL netpbm decode: (doc_key, payload) ->
    IMAGE_META_SCHEMA. mean_luma averages the decoded sample plane
    (normalized by maxval), so the test can cross-check against a direct
    numpy computation on the same bytes."""
    for pdf in batches:
        if len(pdf) == 0:
            continue
        keys, ws, hs, mv, chs, lum = [], [], [], [], [], []
        for key, p in zip(pdf["doc_key"], pdf["payload"]):
            b = bytes(p) if p is not None else b""
            w, h, maxval, pixels = decode_image(b)
            keys.append(key)
            ws.append(w)
            hs.append(h)
            mv.append(maxval)
            chs.append(3 if pixels.ndim == 3 else 1)
            lum.append(float(pixels.astype(np.float64).mean()) / maxval)
        yield pd.DataFrame(
            {
                "doc_key": keys,
                "width": ws,
                "height": hs,
                "maxval": mv,
                "channels": chs,
                "mean_luma": lum,
            }
        )


def extract_audio_features_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas body over REAL WAV decode: (doc_key, payload) ->
    AUDIO_FEATURES_SCHEMA. rms/peak are computed on samples normalized to
    [-1, 1] by the sample width's full scale (uint8 is offset-binary)."""
    for pdf in batches:
        if len(pdf) == 0:
            continue
        rows = []
        for key, p in zip(pdf["doc_key"], pdf["payload"]):
            b = bytes(p) if p is not None else b""
            d = decode_audio(b)
            s = d["samples"].astype(np.float64)
            if d["sample_width"] == 1:
                s = (s - 128.0) / 128.0
            else:
                s = s / float(2 ** (8 * d["sample_width"] - 1))
            rows.append(
                (
                    key,
                    d["sample_rate"],
                    d["channels"],
                    d["n_samples"],
                    d["duration_s"],
                    float(np.sqrt((s * s).mean())) if s.size else 0.0,
                    float(np.abs(s).max()) if s.size else 0.0,
                )
            )
        yield pd.DataFrame(
            rows,
            columns=[
                "doc_key",
                "sample_rate",
                "channels",
                "n_samples",
                "duration_s",
                "rms",
                "peak",
            ],
        )


def extract_image_meta(docs, key_col: str, payload_col: str):
    """DataFrame helper: netpbm binary column -> real decoded metadata."""
    from pyspark.sql import functions as F

    return docs.select(
        F.col(key_col).cast("string").alias("doc_key"),
        F.col(payload_col).alias("payload"),
    ).mapInPandas(extract_image_meta_batches, IMAGE_META_SCHEMA)


def extract_audio_features(docs, key_col: str, payload_col: str):
    """DataFrame helper: WAV binary column -> real decoded audio features."""
    from pyspark.sql import functions as F

    return docs.select(
        F.col(key_col).cast("string").alias("doc_key"),
        F.col(payload_col).alias("payload"),
    ).mapInPandas(extract_audio_features_batches, AUDIO_FEATURES_SCHEMA)


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
