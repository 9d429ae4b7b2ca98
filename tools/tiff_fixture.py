#!/usr/bin/env python3
"""Write GeoTIFF fixtures + the expected long-form parquet.

Fully INDEPENDENT of the Scala reader (graft.sources.tiff.TiffFile):
builds the byte layout straight from the public TIFF 6.0 + GeoTIFF
specs — classic little-endian TIFF, one IFD, single 8-bit band,
ModelPixelScaleTag(33550) + ModelTiepointTag(33922). Two layout
variants cover both block shapes:

  data/lossyear_tiled.tif   : 80x48 image, 32x16 tiles (3x3 grid with
                              right/bottom padding), DEFLATE compressed
  data/lossyear_strips.tif  : same image, 16-row strips, uncompressed

value(row, col) = (row*7 + col*3) % 23   (0 acts as the nodata sentinel
in the q76 query, like GFC lossyear=0 = no loss)

Geo: pixel scale 0.025 deg, top-left corner at (10.0 E, 60.0 N) →
x = 10.0 + (col+0.5)*0.025, y = 60.0 - (row+0.5)*0.025 (pixel centers,
the rioxarray convention).

The expected parquet is computed from the FORMULA, so a Scala-side hash
match cross-validates both implementations of the format.
"""
import os
import struct
import zlib

OUT = os.path.join(os.path.dirname(__file__), "..", "data")
W, H = 80, 48
TW, TH = 32, 16
RPS = 16
SX, SY = 0.025, 0.025
OX, OY = 10.0, 60.0


def val(r, c):
    return (r * 7 + c * 3) % 23


def ifd_entry(tag, typ, count, value_or_offset):
    return struct.pack("<HHII", tag, typ, count, value_or_offset)


def build(path, tiled, compress):
    blocks = []
    if tiled:
        for tr in range((H + TH - 1) // TH):
            for tc in range((W + TW - 1) // TW):
                data = bytearray()
                for r in range(TH):
                    for c in range(TW):
                        rr, cc = tr * TH + r, tc * TW + c
                        data.append(val(rr, cc) if rr < H and cc < W else 0)
                blocks.append(bytes(data))
    else:
        for s in range((H + RPS - 1) // RPS):
            rows = min(RPS, H - s * RPS)
            data = bytearray()
            for r in range(rows):
                for c in range(W):
                    data.append(val(s * RPS + r, c))
            blocks.append(bytes(data))
    if compress:
        blocks = [zlib.compress(b, 6) for b in blocks]

    # layout: header(8) | extra values | block data | IFD
    geo_scale = struct.pack("<3d", SX, SY, 0.0)
    geo_tie = struct.pack("<6d", 0.0, 0.0, 0.0, OX, OY, 0.0)

    pos = 8
    scale_off = pos; pos += len(geo_scale)
    tie_off = pos; pos += len(geo_tie)
    n = len(blocks)
    offsets_off = pos; pos += 4 * n
    counts_off = pos; pos += 4 * n
    block_offs = []
    for b in blocks:
        block_offs.append(pos)
        pos += len(b)
    ifd_off = pos

    entries = [
        ifd_entry(256, 4, 1, W),            # ImageWidth
        ifd_entry(257, 4, 1, H),            # ImageLength
        ifd_entry(258, 3, 1, 8),            # BitsPerSample
        ifd_entry(259, 3, 1, 8 if compress else 1),  # Compression
        ifd_entry(262, 3, 1, 1),            # Photometric: BlackIsZero
    ]
    if tiled:
        entries += [
            ifd_entry(322, 3, 1, TW),       # TileWidth
            ifd_entry(323, 3, 1, TH),       # TileLength
            ifd_entry(324, 4, n, offsets_off),
            ifd_entry(325, 4, n, counts_off),
        ]
    else:
        entries += [
            ifd_entry(273, 4, n, offsets_off),  # StripOffsets
            ifd_entry(278, 4, 1, RPS),          # RowsPerStrip
            ifd_entry(279, 4, n, counts_off),   # StripByteCounts
        ]
    entries += [
        ifd_entry(277, 3, 1, 1),            # SamplesPerPixel
        ifd_entry(339, 3, 1, 1),            # SampleFormat: unsigned
        ifd_entry(33550, 12, 3, scale_off),  # ModelPixelScale
        ifd_entry(33922, 12, 6, tie_off),    # ModelTiepoint
    ]
    entries.sort(key=lambda e: struct.unpack("<H", e[:2])[0])

    with open(path, "wb") as f:
        f.write(b"II" + struct.pack("<HI", 42, ifd_off))
        f.write(geo_scale)
        f.write(geo_tie)
        f.write(struct.pack(f"<{n}I", *block_offs))
        f.write(struct.pack(f"<{n}I", *[len(b) for b in blocks]))
        for b in blocks:
            f.write(b)
        f.write(struct.pack("<H", len(entries)))
        for e in entries:
            f.write(e)
        f.write(struct.pack("<I", 0))  # no next IFD


def main():
    os.makedirs(OUT, exist_ok=True)
    build(os.path.join(OUT, "lossyear_tiled.tif"), tiled=True, compress=True)
    build(os.path.join(OUT, "lossyear_strips.tif"), tiled=False, compress=False)

    import pyarrow as pa
    import pyarrow.parquet as pq
    rows = [(OX + (c + 0.5) * SX, OY - (r + 0.5) * SY, val(r, c))
            for r in range(H) for c in range(W)]
    pq.write_table(pa.table({
        "x": pa.array([t[0] for t in rows], pa.float64()),
        "y": pa.array([t[1] for t in rows], pa.float64()),
        "lossyear": pa.array([t[2] for t in rows], pa.int32()),
    }), os.path.join(OUT, "lossyear_expected.parquet"))
    print("wrote lossyear_tiled.tif, lossyear_strips.tif, lossyear_expected.parquet")


if __name__ == "__main__":
    main()
