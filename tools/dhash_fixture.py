#!/usr/bin/env python3
"""Expected perceptual dHash parquet for the PNG fixtures — computed
straight from the pixel FORMULA (png_fixture.py's
pixel(x, y, c) = (x*7 + y*13 + c*29 + id*31) % 256), fully INDEPENDENT
of the Scala decoder path (javax.imageio + Multimodal.imageDhash), so a
hash match cross-validates both implementations.

dHash definition (must mirror Multimodal.imageDhash exactly):
  grayscale sample sum over ALL channels, pooled to a 9-col x 8-row
  grid: cell col = x*9//w, row = y*8//h, value = floor(sum/count),
  empty cells (w < 9 fixtures) are 0; bit r*8+c set iff
  cell[r][c] < cell[r][c+1] (strict). Stored as SIGNED int64.
"""
import os

import pyarrow as pa
import pyarrow.parquet as pq

IMAGES = [(1, 17, 11, 3), (2, 8, 8, 1), (3, 5, 9, 4), (4, 23, 6, 3)]
COLS, ROWS = 9, 8


def pix(img_id, x, y, c):
    return (x * 7 + y * 13 + c * 29 + img_id * 31) % 256


def dhash(img_id, w, h, ch):
    cell_sum = [0] * (COLS * ROWS)
    cell_n = [0] * (COLS * ROWS)
    for y in range(h):
        r = y * ROWS // h
        for x in range(w):
            cell = r * COLS + x * COLS // w
            for c in range(ch):
                cell_sum[cell] += pix(img_id, x, y, c)
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


def main():
    out = os.path.join(os.path.dirname(__file__), "..", "data",
                       "dhash_expected.parquet")
    rows = [(i, w, h, dhash(i, w, h, ch)) for i, w, h, ch in IMAGES]
    tbl = pa.table({
        "media_id": pa.array([r[0] for r in rows], pa.int64()),
        "width": pa.array([r[1] for r in rows], pa.int32()),
        "height": pa.array([r[2] for r in rows], pa.int32()),
        "dhash": pa.array([r[3] for r in rows], pa.int64()),
    })
    pq.write_table(tbl, out)
    for r in rows:
        print(r)


if __name__ == "__main__":
    main()
