"""Multimodal column plumbing: opaque ``binary`` payloads + typed
metadata, decoded/feature-extracted via Arrow-batched ``mapInPandas``.

The container has no codec libraries (PIL/ffmpeg/librosa), so the
image path carries a REAL pure-stdlib PNG codec instead of a stub:

- ``attach_png_payload`` renders a deterministic grayscale PNG per
  document executor-side (zlib deflate, scanline filters cycling
  through all five PNG filter types so the decoder's un-filter path is
  fully exercised);
- ``decode_png_images`` performs the genuine inverse — chunk walk with
  CRC verification, IHDR parse, IDAT inflate, per-scanline un-filter
  (None/Sub/Up/Average/Paeth) — and emits decoded width/height and the
  exact pixel sum.

Pixel CONTENT is arithmetic in (doc_id, pixel index) and the
dimensions are arithmetic in the text's byte length, so a SQL oracle
can recompute the expected decode output without a PNG library while
the Spark side still round-trips real bytes through a real codec.
``sample_frames`` keeps the 1:N frame-sampler batch shape (multiple
output rows per payload) with a checksum kernel.

Scale notes: ``mapInPandas`` ships Arrow record batches to a Python
worker per partition — no per-row pickling; binary payloads never pass
through the driver; output schemas are declared up front so downstream
stays columnar.  Partitioning is whatever the upstream scan gives —
for 100 TB of images that means size-balanced input files, and the
decode is embarrassingly parallel.

Reference parity note: the reference has no binary columns at all
(`/root/reference/myfitnesspaw/sql.py:7-145` is TEXT/INTEGER/REAL
only); this module is the LLM-pipeline extension surface.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

DECODED_IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("pixel_sum", T.LongType()),
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


# --- PNG codec (pure stdlib; inverse pair) ---------------------------------

def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def synth_pixels(doc_id: int, w: int, h: int) -> bytes:
    """Deterministic pixel field: pixel(i) = (doc_id*31 + i*7) mod 256.
    Arithmetic in (doc_id, i) so a SQL oracle can recompute the sum."""
    return bytes((doc_id * 31 + i * 7) % 256 for i in range(w * h))


def png_encode_gray(pixels: bytes, w: int, h: int) -> bytes:
    """8-bit grayscale PNG.  Scanline r uses filter type r mod 5, so a
    round trip exercises every un-filter branch (the encoder in
    report/chart.py only ever emits filter 0)."""
    raw = bytearray()
    prev = bytes(w)
    for r in range(h):
        line = pixels[r * w : (r + 1) * w]
        ft = r % 5
        raw.append(ft)
        if ft == 0:  # None
            raw += line
        elif ft == 1:  # Sub
            raw += bytes(
                (line[i] - (line[i - 1] if i else 0)) & 0xFF for i in range(w)
            )
        elif ft == 2:  # Up
            raw += bytes((line[i] - prev[i]) & 0xFF for i in range(w))
        elif ft == 3:  # Average
            raw += bytes(
                (line[i] - (((line[i - 1] if i else 0) + prev[i]) >> 1)) & 0xFF
                for i in range(w)
            )
        else:  # Paeth
            raw += bytes(
                (
                    line[i]
                    - _paeth(
                        line[i - 1] if i else 0, prev[i], prev[i - 1] if i else 0
                    )
                )
                & 0xFF
                for i in range(w)
            )
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)  # 8-bit grayscale
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _chunk(b"IEND", b"")
    )


def png_decode_gray(data: bytes) -> tuple[int, int, bytes]:
    """Full inverse: chunk walk + CRC verify, IHDR parse, IDAT inflate,
    per-scanline un-filter.  Returns (width, height, pixels)."""
    if data[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos = len(_PNG_SIG)
    w = h = None
    idat = bytearray()
    while pos < len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + ln]
        (crc,) = struct.unpack(">I", data[pos + 8 + ln : pos + 12 + ln])
        if zlib.crc32(tag + payload) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch in {tag!r} chunk")
        if tag == b"IHDR":
            w, h, bit_depth, color_type, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            if (bit_depth, color_type, interlace) != (8, 0, 0):
                raise ValueError("decoder supports 8-bit non-interlaced grayscale")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if w is None:
        raise ValueError("missing IHDR")
    raw = zlib.decompress(bytes(idat))
    if len(raw) != h * (w + 1):
        raise ValueError("IDAT length does not match dimensions")
    pixels = bytearray()
    prev = bytes(w)
    for r in range(h):
        ft = raw[r * (w + 1)]
        line = raw[r * (w + 1) + 1 : (r + 1) * (w + 1)]
        out = bytearray(w)
        for i in range(w):
            x = line[i]
            a = out[i - 1] if i else 0
            b = prev[i]
            c = prev[i - 1] if i else 0
            if ft == 0:
                out[i] = x
            elif ft == 1:
                out[i] = (x + a) & 0xFF
            elif ft == 2:
                out[i] = (x + b) & 0xFF
            elif ft == 3:
                out[i] = (x + ((a + b) >> 1)) & 0xFF
            elif ft == 4:
                out[i] = (x + _paeth(a, b, c)) & 0xFF
            else:
                raise ValueError(f"bad filter type {ft}")
        pixels += out
        prev = bytes(out)
    return w, h, bytes(pixels)


def _encode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        payloads = [
            png_encode_gray(
                synth_pixels(doc_id, n % 37 + 8, n % 23 + 8), n % 37 + 8, n % 23 + 8
            )
            for doc_id, n in zip(pdf["doc_id"], pdf["n_bytes"])
        ]
        yield pd.DataFrame(
            {"doc_id": pdf["doc_id"], "payload": pd.Series(payloads, dtype="object")}
        )


def attach_png_payload(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Render one synthetic grayscale PNG per document, executor-side.
    Dimensions derive from the text's byte length (w = n%37+8,
    h = n%23+8), pixels from :func:`synth_pixels` — both arithmetic, so
    the decode output is oracle-checkable end-to-end."""
    sized = docs.select(
        F.col(id_col).alias("doc_id"),
        F.octet_length(F.encode(F.col(text_col), "UTF-8")).cast("long").alias("n_bytes"),
    )
    return sized.mapInPandas(
        _encode_batches, T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("payload", T.BinaryType()),
            ]
        )
    )


def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        ids, ws, hs, sums = [], [], [], []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            w, h, pixels = png_decode_gray(bytes(payload))
            ids.append(doc_id)
            ws.append(w)
            hs.append(h)
            sums.append(sum(pixels))
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(ids, dtype="int64"),
                "width": pd.Series(ws, dtype="int32"),
                "height": pd.Series(hs, dtype="int32"),
                "pixel_sum": pd.Series(sums, dtype="int64"),
            }
        )


def decode_png_images(with_payload: DataFrame) -> DataFrame:
    """1:1 real decode: parse + inflate + un-filter each PNG payload
    and emit decoded dimensions and exact pixel sum."""
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
    """1:N frame sampling: multiple rows per payload (checksum kernel)."""
    return with_payload.mapInPandas(_frame_batches, FRAME_SCHEMA)


RESIZED_IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("out_width", T.IntegerType()),
        T.StructField("out_height", T.IntegerType()),
        T.StructField("resized_sum", T.LongType()),
    ]
)


def _resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    # Real resize path: decode → nearest-neighbor 2× downsample (stride
    # sampling at even coordinates) → RE-ENCODE through the codec →
    # decode again and emit from the round-tripped bytes, so the output
    # proves the full decode/transform/encode cycle, not just the math.
    for pdf in batches:
        ids, ws, hs, sums = [], [], [], []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            w, h, pixels = png_decode_gray(bytes(payload))
            out_w, out_h = (w + 1) // 2, (h + 1) // 2
            small = bytes(
                pixels[(2 * r) * w + (2 * c)]
                for r in range(out_h)
                for c in range(out_w)
            )
            w2, h2, rt = png_decode_gray(png_encode_gray(small, out_w, out_h))
            # Explicit raise, not assert: this round-trip check is the
            # property the resize query certifies, and `python -O`
            # strips asserts (same hazard as the scale-probe guards).
            if (w2, h2, rt) != (out_w, out_h, small):
                raise ValueError(
                    f"codec round trip failed for doc {doc_id}: "
                    f"{(w2, h2)} != {(out_w, out_h)} or payload differs"
                )
            ids.append(doc_id)
            ws.append(out_w)
            hs.append(out_h)
            sums.append(sum(rt))
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(ids, dtype="int64"),
                "out_width": pd.Series(ws, dtype="int32"),
                "out_height": pd.Series(hs, dtype="int32"),
                "resized_sum": pd.Series(sums, dtype="int64"),
            }
        )


def resize_images(with_payload: DataFrame) -> DataFrame:
    """1:1 real resize: decode each PNG, nearest-neighbor downsample by
    2 (even-coordinate sampling), re-encode + re-decode through the
    codec, emit resized dimensions and exact pixel sum."""
    return with_payload.mapInPandas(_resize_batches, RESIZED_IMAGE_SCHEMA)
