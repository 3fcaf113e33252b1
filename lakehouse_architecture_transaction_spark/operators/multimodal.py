"""Multimodal column plumbing: opaque binary payloads with typed
metadata, decoded/feature-extracted via Arrow-batched mapInPandas.

Design: media travels as a ``binary`` column plus a metadata struct
(mime/width/height/duration); decode and feature extraction run as
mapInPandas over size-rebalanced partitions so one executor batch
holds a bounded number of payload bytes. The actual media decode is
STUBBED (image/audio libs are not in this image): ``decode_image``
raises NotImplementedError unless the deterministic fake decoder is
requested — the Spark-side plumbing (schema, partitioning, UDF
signature, batch shape) is real and tested either way.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Metadata carried alongside every payload.
META_SCHEMA = "mime string, width int, height int"

FEATURE_DIM = 16


def make_binary_table(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Build a multimodal-shaped table from the documents fixture:
    payload = utf-8 bytes standing in for an encoded image, plus fake
    typed metadata derived deterministically from the id."""
    return docs.select(
        F.col(id_col),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.struct(
            F.lit("image/fake").alias("mime"),
            (F.pmod(F.col(id_col), F.lit(64)) + 32).cast("int").alias("width"),
            (F.pmod(F.col(id_col), F.lit(48)) + 24).cast("int").alias("height"),
        ).alias("meta"),
    )


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    """Decode an encoded image payload to an HxWx3 array.

    Real decode requires an imaging library not present in this
    image; the deterministic fake expands the payload hash into a
    fixed 8x8x3 array so downstream plumbing is testable.
    """
    if not fake:
        raise NotImplementedError("image decode requires an imaging library (not in this environment)")
    # 8*8*3 = 192 bytes = six repeats of the 32-byte digest.
    digest = hashlib.sha256(payload).digest()
    arr = np.frombuffer((digest * 6)[: 8 * 8 * 3], dtype=np.uint8)
    return arr.reshape(8, 8, 3)


def resize_image(img: np.ndarray, size: tuple[int, int] = (4, 4), fake: bool = True) -> np.ndarray:
    """Resize an HxWx3 array. The real path needs an imaging library
    (not in this environment); the fake path is deterministic
    nearest-neighbor subsampling, which keeps the plumbing (shapes,
    dtypes, batch flow) faithful."""
    if not fake:
        raise NotImplementedError("high-quality resize requires an imaging library")
    h, w = size
    ys = (np.arange(h) * img.shape[0] // h).astype(int)
    xs = (np.arange(w) * img.shape[1] // w).astype(int)
    return img[np.ix_(ys, xs)]


def extract_thumbnails(mm: DataFrame, size: tuple[int, int] = (4, 4)) -> DataFrame:
    """mapInPandas thumbnail pipeline: decode → resize → per-channel
    mean. Output (doc_id, thumb_h, thumb_w, mean_r, mean_g, mean_b)."""
    h, w = size
    out_schema = "doc_id bigint, thumb_h int, thumb_w int, mean_r double, mean_g double, mean_b double"

    def _thumb(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                img = decode_image(bytes(payload), fake=True)
                t = resize_image(img, (h, w), fake=True).astype(np.float64)
                rows.append(
                    {
                        "doc_id": doc_id,
                        "thumb_h": h,
                        "thumb_w": w,
                        "mean_r": float(t[:, :, 0].mean()),
                        "mean_g": float(t[:, :, 1].mean()),
                        "mean_b": float(t[:, :, 2].mean()),
                    }
                )
            yield pd.DataFrame(rows)

    return mm.select("doc_id", "payload").mapInPandas(_thumb, schema=out_schema)


N_FRAMES = 3


def sample_frames(payload: bytes, n_frames: int = N_FRAMES, fake: bool = True) -> list[tuple[str, np.ndarray]]:
    """Sample ``n_frames`` frames from a video payload. Real decode
    needs a media library (not in this environment); the deterministic
    fake derives frame i from sha256(content_sha || '-' || i), so the
    Spark-side plumbing AND the SQL oracle can reproduce it exactly.
    Returns [(frame_sha_hex, HxWx3 array), ...]."""
    if not fake:
        raise NotImplementedError("video decode requires a media library")
    content_sha = hashlib.sha256(payload).hexdigest()
    frames = []
    for i in range(n_frames):
        fsha = hashlib.sha256(f"{content_sha}-{i}".encode()).hexdigest()
        digest = bytes.fromhex(fsha)
        arr = np.frombuffer((digest * 6)[: 8 * 8 * 3], dtype=np.uint8).reshape(8, 8, 3)
        frames.append((fsha, arr))
    return frames


def extract_frame_features(mm: DataFrame, n_frames: int = N_FRAMES) -> DataFrame:
    """mapInPandas frame sampler: one output row per (doc, frame) with
    the frame hash and mean byte value — the video-pipeline shape
    (decode → sample → per-frame featurize) with the decode stubbed."""
    out_schema = "doc_id bigint, frame_idx int, frame_sha string, mean_byte double"

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:  # corrupt/missing blob -> zero frames
                    continue
                for i, (fsha, arr) in enumerate(sample_frames(bytes(payload), n_frames)):
                    rows.append(
                        {
                            "doc_id": doc_id,
                            "frame_idx": i,
                            "frame_sha": fsha,
                            "mean_byte": float(arr.astype(np.float64).mean()),
                        }
                    )
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "frame_sha", "mean_byte"])

    return mm.select("doc_id", "payload").mapInPandas(_frames, schema=out_schema)


N_AUDIO_WINDOWS = 4
AUDIO_WINDOW = 64  # samples per analysis window


def decode_audio(payload: bytes, n_samples: int = N_AUDIO_WINDOWS * AUDIO_WINDOW, fake: bool = True) -> np.ndarray:
    """Decode an audio payload to centered int16 PCM samples. Real
    decode needs an audio library (not in this environment); the
    deterministic fake chains sha256(content_sha || '-a' || i) digests
    into a byte stream and centers to [-128, 127], so both the Spark
    plumbing and the SQL oracle reproduce it exactly."""
    if not fake:
        raise NotImplementedError("audio decode requires an audio library (not in this environment)")
    content_sha = hashlib.sha256(payload).hexdigest()
    buf = b""
    i = 0
    while len(buf) < n_samples:
        buf += hashlib.sha256(f"{content_sha}-a{i}".encode()).digest()
        i += 1
    return np.frombuffer(buf[:n_samples], dtype=np.uint8).astype(np.int16) - 128


def extract_audio_features(mm: DataFrame, n_windows: int = N_AUDIO_WINDOWS) -> DataFrame:
    """mapInPandas audio featurizer: decode → fixed windows → per-
    window mean absolute amplitude (the audio-pipeline shape: decode →
    frame → featurize, one output row per (doc, window)). mean_abs is
    an exact power-of-two division of an integer sum, so the oracle
    matches bit-for-bit."""
    out_schema = "doc_id bigint, window_idx int, n_samples int, mean_abs double"

    def _audio(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:  # corrupt/missing blob -> zero windows
                    continue
                pcm = decode_audio(bytes(payload), n_windows * AUDIO_WINDOW, fake=True)
                for w in range(n_windows):
                    win = pcm[w * AUDIO_WINDOW : (w + 1) * AUDIO_WINDOW]
                    rows.append(
                        {
                            "doc_id": doc_id,
                            "window_idx": w,
                            "n_samples": AUDIO_WINDOW,
                            "mean_abs": float(np.abs(win).sum()) / AUDIO_WINDOW,
                        }
                    )
            yield pd.DataFrame(rows, columns=["doc_id", "window_idx", "n_samples", "mean_abs"])

    return mm.select("doc_id", "payload").mapInPandas(_audio, schema=out_schema)


def extract_features(mm: DataFrame, batch_target_rows: int = 1024, fake_decode: bool = True) -> DataFrame:
    """mapInPandas feature extractor: payload → byte-histogram feature
    vector (FEATURE_DIM buckets, L1-normalized) + content hash.

    The Arrow batches keep payloads off the driver entirely; at scale
    you repartition by size first so a batch's total payload bytes are
    bounded (here the fixture payloads are tiny).
    """
    out_schema = "doc_id bigint, content_sha string, n_bytes bigint, feature array<float>"

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:  # corrupt/missing blob -> dropped
                    continue
                b = bytes(payload)
                if fake_decode:
                    img = decode_image(b, fake=True)
                    hist, _ = np.histogram(img, bins=FEATURE_DIM, range=(0, 256))
                else:  # pragma: no cover - real decoder not in image
                    img = decode_image(b, fake=False)
                    hist, _ = np.histogram(img, bins=FEATURE_DIM, range=(0, 256))
                total = float(hist.sum()) or 1.0
                rows.append(
                    {
                        "doc_id": doc_id,
                        "content_sha": hashlib.sha256(b).hexdigest(),
                        "n_bytes": len(b),
                        "feature": (hist / total).astype(np.float32),
                    }
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "content_sha", "n_bytes", "feature"]
            )

    return mm.select("doc_id", "payload").repartition(
        max(1, mm.sparkSession.sparkContext.defaultParallelism)
    ).mapInPandas(_extract, schema=out_schema)
