#!/usr/bin/env python3
"""Write real PNG fixtures + the expected decode parquet.

Fully INDEPENDENT of the Scala decoder (graft.operators.Multimodal
decodeImages / javax.imageio): the PNGs are built straight from the
public PNG specification (RFC 2083) with stdlib zlib/struct — signature,
IHDR, one zlib-compressed IDAT of filter-0 scanlines, IEND. The expected
parquet is computed from the pixel FORMULA, not by reading the PNGs
back, so a Scala-side hash match cross-validates both implementations.

Images (pixel(x, y, c) = (x*7 + y*13 + c*29 + id*31) % 256):
  data/png/img_1.png : 17x11 RGB
  data/png/img_2.png :  8x8  grayscale
  data/png/img_3.png :  5x9  RGBA
  data/png/img_4.png : 23x6  RGB

Expected columns: width/height/channels, pix_sum (exact int sum over all
samples), mean_intensity = pix_sum/(w*h*c), and a 2x2 pooled-intensity
grid p00..p11 (cell of pixel x = x*2//w; mean over the cell's samples).
Integer sums + one double division are bit-identical across engines.
"""
import os
import struct
import zlib

OUT = os.path.join(os.path.dirname(__file__), "..", "data", "png")
IMAGES = [(1, 17, 11, 3), (2, 8, 8, 1), (3, 5, 9, 4), (4, 23, 6, 3)]
GRID = 2


def pix(img_id, x, y, c):
    return (x * 7 + y * 13 + c * 29 + img_id * 31) % 256


def chunk(typ: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + typ + data +
            struct.pack(">I", zlib.crc32(typ + data)))


def png(img_id, w, h, ch) -> bytes:
    color_type = {1: 0, 3: 2, 4: 6}[ch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = b"".join(
        b"\x00" + bytes(pix(img_id, x, y, c)
                        for x in range(w) for c in range(ch))
        for y in range(h))
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) +
            chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


def expected_row(img_id, w, h, ch):
    total = sum(pix(img_id, x, y, c)
                for y in range(h) for x in range(w) for c in range(ch))
    cells = [[0, 0] for _ in range(GRID * GRID)]  # [sum, n_samples]
    for y in range(h):
        for x in range(w):
            cell = (y * GRID // h) * GRID + (x * GRID // w)
            for c in range(ch):
                cells[cell][0] += pix(img_id, x, y, c)
                cells[cell][1] += 1
    pools = [s / n for s, n in cells]
    return (img_id, w, h, ch, total, total / (w * h * ch), *pools)


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    for img_id, w, h, ch in IMAGES:
        with open(os.path.join(OUT, f"img_{img_id}.png"), "wb") as f:
            f.write(png(img_id, w, h, ch))

    import pyarrow as pa
    import pyarrow.parquet as pq
    rows = [expected_row(*img) for img in IMAGES]
    cols = ["media_id", "width", "height", "channels", "pix_sum",
            "mean_intensity", "p00", "p01", "p10", "p11"]
    types = [pa.int64(), pa.int32(), pa.int32(), pa.int32(), pa.int64(),
             pa.float64(), pa.float64(), pa.float64(), pa.float64(),
             pa.float64()]
    table = pa.table({c: pa.array([r[i] for r in rows], t)
                      for i, (c, t) in enumerate(zip(cols, types))})
    pq.write_table(table, os.path.join(
        os.path.dirname(__file__), "..", "data", "png_expected.parquet"))
    print("wrote data/png/img_{1..4}.png, data/png_expected.parquet")


if __name__ == "__main__":
    main()
