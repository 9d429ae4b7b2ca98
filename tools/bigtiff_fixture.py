#!/usr/bin/env python3
"""Independent BigTIFF fixture writer (graft-cog BigTIFF read path +
q97): builds the byte layout straight from the public BigTIFF
specification — magic 43, 8-byte offsets, IFD8 with 20-byte entries,
LONG8 (type 16) tile offset/count arrays — with the same content
conventions as tiff_fixture.py (single 8-bit band, 32x16 deflate
tiles, pixel-scale/tiepoint georeferencing). Real GFC mosaics and
large COGs use BigTIFF once they outgrow classic TIFF's 4 GB offset
space; the fixture is small but exercises every BigTIFF-specific
structure. Expected parquet comes from the value FORMULA, so a hash
match cross-validates both implementations of the format.

value(row, col) = (row*11 + col*5) % 29 (0 = nodata sentinel)
x = 4.0 + (col+0.5)*0.05, y = 52.0 - (row+0.5)*0.05
"""
import os
import struct
import zlib

import pyarrow as pa
import pyarrow.parquet as pq

OUT = os.path.join(os.path.dirname(__file__), "..", "data")
W, H = 70, 40
TW, TH = 32, 16
SX, SY = 0.05, 0.05
OX, OY = 4.0, 52.0


def val(r, c):
    return (r * 11 + c * 5) % 29


def main():
    blocks = []
    for tr in range((H + TH - 1) // TH):
        for tc in range((W + TW - 1) // TW):
            data = bytearray()
            for r in range(TH):
                for c in range(TW):
                    rr, cc = tr * TH + r, tc * TW + c
                    data.append(val(rr, cc) if rr < H and cc < W else 0)
            blocks.append(zlib.compress(bytes(data), 6))

    n = len(blocks)
    geo_scale = struct.pack("<3d", SX, SY, 0.0)
    geo_tie = struct.pack("<6d", 0.0, 0.0, 0.0, OX, OY, 0.0)

    # layout: header(16) | extra arrays | block data | IFD8
    pos = 16
    scale_off = pos; pos += len(geo_scale)
    tie_off = pos; pos += len(geo_tie)
    offsets_off = pos; pos += 8 * n
    counts_off = pos; pos += 8 * n
    block_offs = []
    for b in blocks:
        block_offs.append(pos)
        pos += len(b)
    ifd_off = pos

    def entry(tag, typ, count, value):
        return struct.pack("<HHQQ", tag, typ, count, value)

    entries = [
        entry(256, 4, 1, W),
        entry(257, 4, 1, H),
        entry(258, 3, 1, 8),
        entry(259, 3, 1, 8),     # deflate
        entry(262, 3, 1, 1),
        entry(277, 3, 1, 1),
        entry(322, 3, 1, TW),
        entry(323, 3, 1, TH),
        entry(324, 16, n, offsets_off),  # LONG8 tile offsets
        entry(325, 16, n, counts_off),   # LONG8 tile byte counts
        entry(339, 3, 1, 1),
        entry(33550, 12, 3, scale_off),
        entry(33922, 12, 6, tie_off),
    ]
    ifd = struct.pack("<Q", len(entries)) + b"".join(entries) + struct.pack("<Q", 0)

    out = bytearray()
    out += b"II" + struct.pack("<HHHQ", 43, 8, 0, ifd_off)
    out += geo_scale + geo_tie
    out += b"".join(struct.pack("<Q", o) for o in block_offs)
    out += b"".join(struct.pack("<Q", len(b)) for b in blocks)
    out += b"".join(blocks)
    out += ifd
    assert len(out) == ifd_off + len(ifd)

    path = os.path.join(OUT, "lossyear_big.tif")
    open(path, "wb").write(bytes(out))
    print(f"{path}: {len(out)} bytes, {n} tiles (BigTIFF)")

    xs, ys, vs = [], [], []
    for r in range(H):
        for c in range(W):
            xs.append(OX + (c + 0.5) * SX)
            ys.append(OY - (r + 0.5) * SY)
            vs.append(val(r, c))
    table = pa.table({
        "x": pa.array(xs, pa.float64()),
        "y": pa.array(ys, pa.float64()),
        "lossyear": pa.array(vs, pa.int32()),
    })
    exp = os.path.join(OUT, "lossyear_big_expected.parquet")
    pq.write_table(table, exp, compression="zstd")
    print(f"{exp}: {table.num_rows} rows")


if __name__ == "__main__":
    main()
