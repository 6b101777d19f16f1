"""Multimodal column plumbing: opaque ``binary`` payloads + typed
metadata, decoded/feature-extracted via Arrow-batched ``mapInPandas``.

The real decoders (PIL/ffmpeg/librosa) are NOT in this container, so
the decode kernel is split:

- the Spark-side plumbing — binary column, schema, ``mapInPandas``
  batch iteration, 1:1 and 1:N output shapes — is REAL and tested;
- the pixel/sample decode itself is a deterministic fake
  (length-derived dimensions, md5 checksums); the library-backed
  implementation raises ``NotImplementedError`` behind an import-try
  (``real_image_decode``).

Scale notes: ``mapInPandas`` ships Arrow record batches to a Python
worker per partition — no per-row pickling; binary payloads never pass
through the driver; output schemas are declared up front so downstream
stays columnar.  Partitioning is whatever the upstream scan gives —
for 100 TB of images that means size-balanced input files, and the
decode is embarrassingly parallel.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DECODED_IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("fake_width", T.IntegerType()),
        T.StructField("fake_height", T.IntegerType()),
        T.StructField("checksum", T.StringType()),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_no", T.IntegerType()),
        T.StructField("frame_checksum", T.StringType()),
    ]
)


def attach_binary_payload(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Materialize an opaque binary column (here: UTF-8 bytes of the
    text, standing in for image/audio blobs) plus its id."""
    return docs.select(F.col(id_col), F.encode(F.col(text_col), "UTF-8").alias("payload"))


def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        payload = pdf["payload"]
        n = payload.apply(len)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": n.astype("int64"),
                "fake_width": (n % 64 + 16).astype("int32"),
                "fake_height": (n % 48 + 16).astype("int32"),
                "checksum": payload.apply(lambda b: hashlib.md5(bytes(b)).hexdigest()),
            }
        )


def decode_images(with_payload: DataFrame) -> DataFrame:
    """1:1 decode: one metadata row per payload (fake kernel)."""
    return with_payload.mapInPandas(_decode_batches, DECODED_IMAGE_SCHEMA)


def _frame_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    # 1:N shape: n_frames = n_bytes % 4 + 1 "frames" per payload, each
    # checksummed over (payload, frame_no) — the batch shape a video
    # frame-sampler produces.
    for pdf in batches:
        ids, frames, sums = [], [], []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            b = bytes(payload)
            for i in range(len(b) % 4 + 1):
                ids.append(doc_id)
                frames.append(i)
                sums.append(hashlib.md5(b + b"|" + str(i).encode()).hexdigest())
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(ids, dtype="int64"),
                "frame_no": pd.Series(frames, dtype="int32"),
                "frame_checksum": pd.Series(sums, dtype="object"),
            }
        )


def sample_frames(with_payload: DataFrame) -> DataFrame:
    """1:N frame sampling: multiple rows per payload (fake kernel)."""
    return with_payload.mapInPandas(_frame_batches, FRAME_SCHEMA)


def real_image_decode(with_payload: DataFrame) -> DataFrame:
    """Library-backed decode — unavailable in this container.

    Kept as the marked extension point: same signature and output
    schema as ``decode_images``; a deployment with PIL installed swaps
    the kernel, nothing else changes.
    """
    try:
        import PIL  # noqa: F401
    except ImportError as exc:  # pragma: no cover
        raise NotImplementedError(
            "image decode requires PIL; use decode_images (deterministic fake)"
        ) from exc
    raise NotImplementedError("real decode kernel not implemented in this environment")
