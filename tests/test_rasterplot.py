"""The stdlib PNG renderer behind S9's matplotlib-less fallback.

Validation decodes the file with zlib+struct alone (this container has no
PIL): chunk walk, CRC verification, IHDR geometry, and an inflate of the
IDAT stream back to exact scanline byte-length — i.e. the file is proven
structurally decodable, not just signature-prefixed.
"""

from __future__ import annotations

import math
import struct
import zlib

import pytest

from airflow_crypto_btc_spark.functions.rasterplot import (
    Canvas,
    render_line_chart,
)


def _decode_png(data: bytes) -> tuple[int, int, bytes]:
    """Walk chunks, verify every CRC, return (width, height, raw scanlines)."""
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    pos = 8
    width = height = None
    idat = b""
    seen_end = False
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(
            ">I", data[pos + 8 + length : pos + 12 + length]
        )
        assert crc == (zlib.crc32(tag + payload) & 0xFFFFFFFF), tag
        if tag == b"IHDR":
            width, height, depth, ctype = struct.unpack(
                ">IIBB", payload[:10]
            )
            assert (depth, ctype) == (8, 2)  # 8-bit truecolor
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            seen_end = True
        pos += 12 + length
    assert seen_end and width and height
    raw = zlib.decompress(idat)
    assert len(raw) == height * (1 + 3 * width)  # filter byte + RGB rows
    return width, height, raw


@pytest.mark.smoke
def test_canvas_png_is_structurally_valid() -> None:
    c = Canvas(40, 30)
    c.line(0, 0, 39, 29, (255, 0, 0))
    w, h, raw = _decode_png(c.to_png())
    assert (w, h) == (40, 30)
    # every scanline uses filter 0 (the renderer's contract)
    stride = 1 + 3 * w
    assert all(raw[i] == 0 for i in range(0, len(raw), stride))


@pytest.mark.smoke
def test_render_line_chart_draws_all_series(tmp_path) -> None:
    out = str(tmp_path / "chart.png")
    xs = [f"2024-01-{d:02d}" for d in range(1, 61)]
    series = {
        "close": [100 + 5 * math.sin(i / 5) for i in range(60)],
        # warm-up gap: leading NaNs must render as a gap, not a crash
        "ma7": [float("nan")] * 6 + [100.0 + i / 10 for i in range(54)],
        "ma30": [None] * 29 + [101.0] * 31,
    }
    path = render_line_chart(out, xs, series, title="daily close / ma7 / ma30")
    w, h, raw = _decode_png(open(path, "rb").read())
    assert (w, h) == (720, 360)
    # each series color appears in the raster (polylines actually drawn)
    stride = 1 + 3 * w
    pixels = set()
    for y in range(h):
        row = raw[y * stride + 1 : (y + 1) * stride]
        for x in range(0, 3 * w, 3):
            pixels.add(bytes(row[x : x + 3]))
    for rgb in ((31, 119, 180), (255, 127, 14), (44, 160, 44)):
        assert bytes(rgb) in pixels, f"series color {rgb} missing"
    assert bytes((20, 20, 20)) in pixels  # title/legend text rendered


def test_render_rejects_empty_and_all_nan() -> None:
    with pytest.raises(ValueError):
        render_line_chart("/tmp/never.png", [], {}, title="")
    with pytest.raises(ValueError):
        render_line_chart(
            "/tmp/never.png", ["a"], {"s": [float("nan")]}, title=""
        )


def test_flat_series_does_not_divide_by_zero(tmp_path) -> None:
    out = str(tmp_path / "flat.png")
    render_line_chart(out, ["a", "b", "c"], {"s": [5.0, 5.0, 5.0]})
    w, h, _ = _decode_png(open(out, "rb").read())
    assert (w, h) == (720, 360)
