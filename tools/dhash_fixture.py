#!/usr/bin/env python3
"""Expected perceptual dHash parquet + near-dup PNG fixture set —
computed straight from the pixel FORMULA (png_fixture.py's
pixel(x, y, c) = (x*7 + y*13 + c*29 + id*31) % 256), fully INDEPENDENT
of the Scala decoder path (javax.imageio + Multimodal.imageDhash), so a
hash match cross-validates both implementations.

dHash definition (must mirror Multimodal.imageDhash exactly):
  grayscale sample sum over ALL channels, pooled to a 9-col x 8-row
  grid: cell col = x*9//w, row = y*8//h, value = floor(sum/count),
  empty cells (w < 9 fixtures) are 0; bit r*8+c set iff
  cell[r][c] < cell[r][c+1] (strict). Stored as SIGNED int64.

Fixture set (data/png_dedup/, separate from q80's data/png so the
decode-stat expectations there stay 4-row):
  img_1..img_4 : the four base images (pairwise hamming >= 17)
  img_5        : pixel-exact copy of img_1 (source id 1) -> hamming 0
  img_6        : img_2 with pixel (x=7, y=0) forced to 0 — that pixel
                 is the sole occupant of pooled cell (row 0, col 7),
                 whose only live comparison is bit 6 (cv(0,6)<cv(0,7);
                 the col-7-vs-col-8 comparison is against an EMPTY cell
                 value 0, unflippable for unsigned pixels) -> hamming 1.
The near-dup pairs (1,5) h=0 and (2,6) h=1 are the banded-candidate
query's planted positives; every other pair is far outside the
hamming<=3 gate.
"""
import os
import struct
import zlib

import pyarrow as pa
import pyarrow.parquet as pq

COLS, ROWS = 9, 8
# (media_id, source_formula_id, w, h, channels, {(x,y,c): override})
IMAGES = [
    (1, 1, 17, 11, 3, {}),
    (2, 2, 8, 8, 1, {}),
    (3, 3, 5, 9, 4, {}),
    (4, 4, 23, 6, 3, {}),
    (5, 1, 17, 11, 3, {}),                 # exact copy of img_1
    (6, 2, 8, 8, 1, {(7, 0, 0): 0}),       # one-bit near-dup of img_2
]


def pix(src_id, x, y, c, over):
    if (x, y, c) in over:
        return over[(x, y, c)]
    return (x * 7 + y * 13 + c * 29 + src_id * 31) % 256


def dhash(src_id, w, h, ch, over):
    cell_sum = [0] * (COLS * ROWS)
    cell_n = [0] * (COLS * ROWS)
    for y in range(h):
        r = y * ROWS // h
        for x in range(w):
            cell = r * COLS + x * COLS // w
            for c in range(ch):
                cell_sum[cell] += pix(src_id, x, y, c, over)
            cell_n[cell] += ch
    def cv(i):
        return cell_sum[i] // cell_n[i] if cell_n[i] else 0
    hv = 0
    for r in range(ROWS):
        for c0 in range(COLS - 1):
            if cv(r * COLS + c0) < cv(r * COLS + c0 + 1):
                hv |= 1 << (r * (COLS - 1) + c0)
    if hv >= 1 << 63:
        hv -= 1 << 64
    return hv


def chunk(typ: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + typ + data +
            struct.pack(">I", zlib.crc32(typ + data)))


def png(src_id, w, h, ch, over) -> bytes:
    color_type = {1: 0, 3: 2, 4: 6}[ch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = b"".join(
        b"\x00" + bytes(pix(src_id, x, y, c, over)
                        for x in range(w) for c in range(ch))
        for y in range(h))
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) +
            chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


def main():
    base = os.path.join(os.path.dirname(__file__), "..", "data")
    png_dir = os.path.join(base, "png_dedup")
    os.makedirs(png_dir, exist_ok=True)
    rows = []
    for mid, src, w, h, ch, over in IMAGES:
        with open(os.path.join(png_dir, f"img_{mid}.png"), "wb") as f:
            f.write(png(src, w, h, ch, over))
        rows.append((mid, w, h, dhash(src, w, h, ch, over)))
    tbl = pa.table({
        "media_id": pa.array([r[0] for r in rows], pa.int64()),
        "width": pa.array([r[1] for r in rows], pa.int32()),
        "height": pa.array([r[2] for r in rows], pa.int32()),
        "dhash": pa.array([r[3] for r in rows], pa.int64()),
    })
    pq.write_table(tbl, os.path.join(base, "dhash_expected.parquet"))
    for r in rows:
        print(r)
    # sanity: planted hamming distances
    hs = {r[0]: r[3] for r in rows}
    def ham(a, b):
        return bin((hs[a] ^ hs[b]) & ((1 << 64) - 1)).count("1")
    print("ham(1,5) =", ham(1, 5), " ham(2,6) =", ham(2, 6))
    assert ham(1, 5) == 0 and 1 <= ham(2, 6) <= 3


if __name__ == "__main__":
    main()
