#!/usr/bin/env python3
"""GDAL-style shared-JPEGTables tiled TIFF fixture (pure stdlib).

`gdal_retile ... -co COMPRESS=JPEG` writes compression-7 TIFFs whose
DQT/DHT segments live ONCE in the JPEGTables tag (347) and whose tiles
are ABBREVIATED streams (SOI + SOF0 + SOS + entropy + EOI) — TIFF
TechNote 2. This writer produces that layout straight from the specs,
fully independent of the Scala reader: a 32x32 grayscale image of
8x8-UNIFORM blocks (value = (bx*29 + by*53) % 255 + 1 at global block
coords) split into four 16x16 tiles, DC-only under the all-ones quant
table so any conformant decoder reconstructs the pixels exactly.

Outputs data/jpeg_tables.tif + data/jpeg_tables_expected.parquet
(x, y, value rows from the formula + the GeoTIFF affine below).
Shares only the public Annex K tables with the Scala side (both copy
them from the spec); q207 gates the read path end to end.
"""
import os
import struct
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from jpeg_min import DC_BITS, DC_VALS, AC_BITS, AC_VALS, DC_CODE, AC_EOB, \
    _BitWriter, _seg  # noqa: E402

W, H = 32, 32
TW, TH = 16, 16
OX, OY, SX, SY = (250000.0, 600000.0, 20.0, 20.0)


def block_val(bx, by):
    return (bx * 29 + by * 53) % 255 + 1


def tables_stream():
    out = bytearray(b"\xFF\xD8")  # SOI
    out += _seg(0xDB, b"\x00" + b"\x01" * 64)  # DQT table 0, all ones
    out += _seg(0xC4, b"\x00" + bytes(DC_BITS) + bytes(DC_VALS) +
                b"\x10" + bytes(AC_BITS) + bytes(AC_VALS))
    out += b"\xFF\xD9"  # EOI
    return bytes(out)


def abbreviated_tile(vals, bw_, bh_):
    """SOI + SOF0 + SOS + entropy + EOI — no DQT/DHT (they live in 347)."""
    out = bytearray(b"\xFF\xD8")
    out += _seg(0xC0, struct.pack(">BHHB", 8, 8 * bh_, 8 * bw_, 1) +
                bytes([1, 0x11, 0]))
    out += _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    bw = _BitWriter()
    prev = 0

    def put_dc(diff):
        mag = abs(diff)
        t = mag.bit_length()
        code, length = DC_CODE[t]
        bw.put(code, length)
        if t:
            bw.put(diff if diff >= 0 else diff + (1 << t) - 1, t)
        bw.put(*AC_EOB)

    for by in range(bh_):
        for bx in range(bw_):
            dc = 8 * (vals[by][bx] - 128)
            put_dc(dc - prev)
            prev = dc
    out += bw.done()
    out += b"\xFF\xD9"
    return bytes(out)


def main():
    base = os.path.join(os.path.dirname(__file__), "..", "data")
    tables = tables_stream()
    tiles = []
    ta = W // TW
    for t in range(ta * (H // TH)):
        c0, r0 = (t % ta) * TW, (t // ta) * TH
        vals = [[block_val((c0 + 8 * bx) // 8, (r0 + 8 * by) // 8)
                 for bx in range(TW // 8)] for by in range(TH // 8)]
        tiles.append(abbreviated_tile(vals, TW // 8, TH // 8))

    # ---- classic little-endian TIFF, one IFD ----
    tags = []  # (tag, type, count, value_or_bytes)
    nT = len(tiles)
    # layout: header(8) + ifd + external arrays + tile data
    entries = 14
    ifd_size = 2 + entries * 12 + 4
    ext = bytearray()
    ext_base = 8 + ifd_size

    def ext_put(data):
        off = ext_base + len(ext)
        ext.extend(data)
        return off

    geo_scale = ext_put(struct.pack("<3d", SX, SY, 0.0))
    geo_tie = ext_put(struct.pack("<6d", 0, 0, 0, OX, OY, 0))
    tbl_off = ext_put(tables)
    # tile data begins after offsets+counts arrays
    offs_off = ext_base + len(ext)
    cnts_off = offs_off + 4 * nT
    data_off = cnts_off + 4 * nT
    offs = []
    pos = data_off
    for t in tiles:
        offs.append(pos)
        pos += len(t)
    ext.extend(struct.pack(f"<{nT}I", *offs))
    ext.extend(struct.pack(f"<{nT}I", *[len(t) for t in tiles]))

    def entry(tag, typ, cnt, val):
        return struct.pack("<HHI", tag, typ, cnt) + struct.pack("<I", val)

    ifd = struct.pack("<H", entries)
    ifd += entry(256, 4, 1, W)
    ifd += entry(257, 4, 1, H)
    ifd += entry(258, 3, 1, 8)
    ifd += entry(259, 3, 1, 7)       # JPEG
    ifd += entry(262, 3, 1, 1)       # BlackIsZero
    ifd += entry(277, 3, 1, 1)
    ifd += entry(322, 3, 1, TW)
    ifd += entry(323, 3, 1, TH)
    ifd += entry(324, 4, nT, offs_off)
    ifd += entry(325, 4, nT, cnts_off)
    ifd += entry(339, 3, 1, 1)
    ifd += entry(347, 7, len(tables), tbl_off)  # shared JPEG tables
    ifd += entry(33550, 12, 3, geo_scale)
    ifd += entry(33922, 12, 6, geo_tie)
    ifd += struct.pack("<I", 0)
    assert len(ifd) == ifd_size

    buf = b"II" + struct.pack("<HI", 42, 8) + ifd + bytes(ext) + \
        b"".join(tiles)
    out_tif = os.path.join(base, "jpeg_tables.tif")
    with open(out_tif, "wb") as f:
        f.write(buf)

    import pyarrow as pa
    import pyarrow.parquet as pq
    xs, ys, vs = [], [], []
    for r in range(H):
        for c in range(W):
            xs.append(OX + (c + 0.5) * SX)
            ys.append(OY - (r + 0.5) * SY)
            vs.append(block_val(c // 8, r // 8))
    pq.write_table(pa.table({
        "x": pa.array(xs, pa.float64()),
        "y": pa.array(ys, pa.float64()),
        "value": pa.array(vs, pa.int32()),
    }), os.path.join(base, "jpeg_tables_expected.parquet"))
    print(f"wrote data/jpeg_tables.tif ({len(buf)} bytes, {nT} tiles, "
          f"tables={len(tables)}B) + expected parquet")


if __name__ == "__main__":
    main()
