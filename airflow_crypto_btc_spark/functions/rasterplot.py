"""Pure-stdlib PNG line-chart renderer (``zlib`` + ``struct`` only).

The reference renders its daily close/ma7/ma30 report with matplotlib
(``dags/dag_btc_daily.py:347-369``); this container has no matplotlib, so
the S9 report stage falls back to this renderer — real RGB scanlines, a
real zlib-compressed IDAT, valid CRCs — instead of degrading to a CSV.
Driver-side by design: the input is the ≤60-row report window already
collected via Arrow ``toPandas()``, never distributed data.

The PNG layout is the minimal standards-compliant one: 8-bit/channel
truecolor (color type 2), no interlace, filter byte 0 on every scanline
(PNG spec, W3C REC-PNG; the format is public knowledge).
"""

from __future__ import annotations

import math
import struct
import zlib
from typing import Sequence

RGB = tuple[int, int, int]

WHITE: RGB = (255, 255, 255)
BLACK: RGB = (20, 20, 20)
GRID: RGB = (220, 220, 220)
AXIS: RGB = (120, 120, 120)
# matplotlib's public default category cycle (tab10), first three entries —
# keeps the fallback chart visually consistent with the matplotlib branch.
SERIES_COLORS: tuple[RGB, ...] = (
    (31, 119, 180),
    (255, 127, 14),
    (44, 160, 44),
    (214, 39, 40),
    (148, 103, 189),
)

# 3x5 bitmap font (rows top→bottom, '1' = lit). Enough coverage for chart
# titles, series labels, ISO dates, and numeric tick labels.
_FONT: dict[str, tuple[str, str, str, str, str]] = {
    "0": ("111", "101", "101", "101", "111"),
    "1": ("010", "110", "010", "010", "111"),
    "2": ("111", "001", "111", "100", "111"),
    "3": ("111", "001", "111", "001", "111"),
    "4": ("101", "101", "111", "001", "001"),
    "5": ("111", "100", "111", "001", "111"),
    "6": ("111", "100", "111", "101", "111"),
    "7": ("111", "001", "010", "010", "010"),
    "8": ("111", "101", "111", "101", "111"),
    "9": ("111", "101", "111", "001", "111"),
    ".": ("000", "000", "000", "000", "010"),
    ",": ("000", "000", "000", "010", "100"),
    "-": ("000", "000", "111", "000", "000"),
    "+": ("000", "010", "111", "010", "000"),
    "/": ("001", "001", "010", "100", "100"),
    ":": ("000", "010", "000", "010", "000"),
    "e": ("111", "100", "110", "100", "111"),
    "a": ("010", "101", "111", "101", "101"),
    "b": ("110", "101", "110", "101", "110"),
    "c": ("011", "100", "100", "100", "011"),
    "d": ("110", "101", "101", "101", "110"),
    "f": ("111", "100", "110", "100", "100"),
    "g": ("011", "100", "101", "101", "011"),
    "h": ("101", "101", "111", "101", "101"),
    "i": ("111", "010", "010", "010", "111"),
    "j": ("001", "001", "001", "101", "010"),
    "k": ("101", "110", "100", "110", "101"),
    "l": ("100", "100", "100", "100", "111"),
    "m": ("101", "111", "111", "101", "101"),
    "n": ("110", "101", "101", "101", "101"),
    "o": ("010", "101", "101", "101", "010"),
    "p": ("110", "101", "110", "100", "100"),
    "q": ("010", "101", "101", "011", "001"),
    "r": ("110", "101", "110", "110", "101"),
    "s": ("011", "100", "010", "001", "110"),
    "t": ("111", "010", "010", "010", "010"),
    "u": ("101", "101", "101", "101", "111"),
    "v": ("101", "101", "101", "101", "010"),
    "w": ("101", "101", "111", "111", "101"),
    "x": ("101", "101", "010", "101", "101"),
    "y": ("101", "101", "010", "010", "010"),
    "z": ("111", "001", "010", "100", "111"),
    " ": ("000", "000", "000", "000", "000"),
}


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


class Canvas:
    """A tiny RGB raster with just the drawing ops a line chart needs."""

    def __init__(self, width: int, height: int, bg: RGB = WHITE) -> None:
        self.width = width
        self.height = height
        self._rows = [bytearray(bytes(bg) * width) for _ in range(height)]

    def put(self, x: int, y: int, rgb: RGB) -> None:
        if 0 <= x < self.width and 0 <= y < self.height:
            i = 3 * x
            self._rows[y][i : i + 3] = bytes(rgb)

    def line(self, x0: int, y0: int, x1: int, y1: int, rgb: RGB) -> None:
        """Bresenham segment (integer-only; endpoints clipped by put)."""
        dx, dy = abs(x1 - x0), -abs(y1 - y0)
        sx, sy = (1 if x0 < x1 else -1), (1 if y0 < y1 else -1)
        err = dx + dy
        x, y = x0, y0
        while True:
            self.put(x, y, rgb)
            if x == x1 and y == y1:
                return
            e2 = 2 * err
            if e2 >= dy:
                err += dy
                x += sx
            if e2 <= dx:
                err += dx
                y += sy

    def fill_rect(self, x: int, y: int, w: int, h: int, rgb: RGB) -> None:
        for yy in range(y, y + h):
            for xx in range(x, x + w):
                self.put(xx, yy, rgb)

    def text(self, x: int, y: int, s: str, rgb: RGB, scale: int = 1) -> None:
        """Render `s` with the 3x5 font, top-left at (x, y); unknown glyphs
        draw as blanks so a stray character never raises mid-render."""
        cx = x
        for ch in s.lower():
            glyph = _FONT.get(ch, _FONT[" "])
            for ry, bits in enumerate(glyph):
                for rx, bit in enumerate(bits):
                    if bit == "1":
                        self.fill_rect(
                            cx + rx * scale, y + ry * scale, scale, scale, rgb
                        )
            cx += (3 + 1) * scale
        return

    def text_width(self, s: str, scale: int = 1) -> int:
        return len(s) * 4 * scale

    def to_png(self) -> bytes:
        raw = b"".join(b"\x00" + bytes(r) for r in self._rows)
        ihdr = struct.pack(">IIBBBBB", self.width, self.height, 8, 2, 0, 0, 0)
        return (
            b"\x89PNG\r\n\x1a\n"
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(raw, 9))
            + _png_chunk(b"IEND", b"")
        )


def _finite(v: object) -> bool:
    return isinstance(v, (int, float)) and math.isfinite(float(v))


def _fmt_tick(v: float) -> str:
    return f"{v:.6g}"


def render_line_chart(
    out_path: str,
    x_labels: Sequence[str],
    series: dict[str, Sequence[float]],
    title: str = "",
    width: int = 720,
    height: int = 360,
) -> str:
    """Write a PNG line chart of `series` (one polyline per key; None/NaN
    points break the line, so indicator warm-up gaps render as gaps, same
    as matplotlib) and return `out_path`."""
    n = max((len(v) for v in series.values()), default=0)
    if n == 0:
        raise ValueError("render_line_chart: no data points")
    vals = [
        float(v) for vs in series.values() for v in vs if _finite(v)
    ]
    if not vals:
        raise ValueError("render_line_chart: no finite values")
    lo, hi = min(vals), max(vals)
    span = (hi - lo) or max(abs(hi), 1.0) * 0.1
    lo, hi = lo - 0.05 * span, hi + 0.05 * span

    c = Canvas(width, height)
    ml, mr, mt, mb = 64, 14, 26, 30  # margins
    px0, px1 = ml, width - mr
    py0, py1 = mt, height - mb

    def sx(i: int) -> int:
        return px0 + (i * (px1 - px0)) // max(n - 1, 1)

    def sy(v: float) -> int:
        return py1 - int(round((v - lo) / (hi - lo) * (py1 - py0)))

    if title:
        c.text(ml, 8, title, BLACK)
    # horizontal gridlines + y tick labels
    for k in range(5):
        gy = py0 + k * (py1 - py0) // 4
        gv = hi - k * (hi - lo) / 4
        c.line(px0, gy, px1, gy, GRID)
        c.text(4, gy - 2, _fmt_tick(gv), AXIS)
    # axes
    c.line(px0, py0, px0, py1, AXIS)
    c.line(px0, py1, px1, py1, AXIS)
    # x labels: first and last
    if x_labels:
        first, last = str(x_labels[0]), str(x_labels[-1])
        c.text(px0, py1 + 6, first, AXIS)
        c.text(px1 - c.text_width(last), py1 + 6, last, AXIS)
    # polylines
    for si, (name, vs) in enumerate(series.items()):
        rgb = SERIES_COLORS[si % len(SERIES_COLORS)]
        prev: tuple[int, int] | None = None
        for i, v in enumerate(vs):
            if not _finite(v):
                prev = None
                continue
            pt = (sx(i), sy(float(v)))
            if prev is not None:
                c.line(prev[0], prev[1], pt[0], pt[1], rgb)
            else:
                c.put(pt[0], pt[1], rgb)
            prev = pt
        # legend entry: swatch + label, stacked top-left inside the plot
        ly = py0 + 4 + si * 10
        c.fill_rect(px0 + 6, ly, 8, 6, rgb)
        c.text(px0 + 18, ly, name, BLACK)

    png = c.to_png()
    with open(out_path, "wb") as fh:
        fh.write(png)
    return out_path
