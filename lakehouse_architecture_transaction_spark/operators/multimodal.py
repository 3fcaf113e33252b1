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
            yield pd.DataFrame(rows)

    return mm.select("doc_id", "payload").repartition(
        max(1, mm.sparkSession.sparkContext.defaultParallelism)
    ).mapInPandas(_extract, schema=out_schema)
