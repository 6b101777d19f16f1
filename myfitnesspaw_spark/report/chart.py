"""R2: render the progress stacked-bar chart to an actual PNG.

The reference draws a single stacked ``barh`` — segment lefts are the
cumulative sum minus the segment width (np.cumsum at
`/root/reference/myfitnesspaw/types.py:168-182`) — and saves a PNG via
matplotlib.  matplotlib isn't available in this container, so the
renderer rasterizes the same geometry into a numpy RGB buffer and
encodes a valid PNG with stdlib zlib (8-bit truecolor, filter 0):
byte-level dependencies are numpy + zlib only.  The segment MATH stays
in :func:`myfitnesspaw_spark.report.progress.chart_segments` (the
tested, load-bearing part); this module is pure rasterization.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _hex_rgb(color: str) -> tuple[int, int, int]:
    c = color.lstrip("#")
    return int(c[0:2], 16), int(c[2:4], 16), int(c[4:6], 16)


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(rgb: np.ndarray) -> bytes:
    """Encode an (H, W, 3) uint8 array as an 8-bit truecolor PNG."""
    if rgb.ndim != 3 or rgb.shape[2] != 3 or rgb.dtype != np.uint8:
        raise ValueError("expected (H, W, 3) uint8 array")
    h, w, _ = rgb.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    # Each scanline is prefixed with filter byte 0 (None).
    raw = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), rgb.reshape(h, w * 3)], axis=1
    ).tobytes()
    return (
        _PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def render_progress_bar_png(
    segments: list[tuple[str, int]],
    palette: dict[str, str],
    width: int = 550,
    height: int = 70,
    background: str = "#ffffff",
) -> bytes:
    """Rasterize the stacked horizontal bar.

    Mirrors the reference's geometry (`types.py:168-182`): one bar,
    segment ``left = cumsum - width`` in goal units, x-axis spanning the
    segment total; 550×70 px matches its 5.5×0.7-inch figure at 100 dpi.
    Zero-width segments draw nothing, exactly as a zero-width barh
    patch would.
    """
    widths = np.array([max(int(w), 0) for _, w in segments], dtype=np.int64)
    total = int(widths.sum())
    img = np.empty((height, width, 3), dtype=np.uint8)
    img[:] = _hex_rgb(background)
    if total <= 0:
        return encode_png(img)

    lefts = np.cumsum(widths) - widths  # the reference's data_cum[:] - data
    # Bar occupies the middle half vertically (ymargin 0.5 equivalent).
    y0, y1 = height // 4, height - height // 4
    for (name, _), seg_w, seg_left in zip(segments, widths, lefts):
        x0 = round(seg_left / total * width)
        x1 = round((seg_left + seg_w) / total * width)
        if x1 > x0:
            img[y0:y1, x0:x1] = _hex_rgb(palette[name])
    return encode_png(img)
