#!/usr/bin/env python3
"""Edge-case format fixtures (independent of the Scala parsers):

  data/ens_scaled.grib2   GRIB2 simple packing with ALL scales nonzero:
                          R=50.0, E=-2 (sign-magnitude), D=1, 12-bit X
                          (non-byte-aligned bitstream); X[k]=k so
                          value[k] = (50.0 + k*2^-2) * 10^-1.
  data/holes.{shp,shx,dbf} one polygon record with TWO rings
                          (outer square + hole) — multi-part parsing and
                          even-odd hole semantics.
"""
import struct

NI, NJ = 4, 3
LA1, LO1, DI, DJ = 60.0, 10.0, 0.5, 0.5


def sec(num, body):
    return struct.pack(">IB", 5 + len(body), num) + body


def grib_scaled():
    s1 = sec(1, struct.pack(">HHBBBHBBBBBBB", 98, 0, 2, 1, 1,
                            2026, 1, 1, 0, 0, 0, 0, 1))
    tmpl3 = struct.pack(">BBIBIBIIIII", 6, 0, 0, 0, 0, 0, 0, NI, NJ, 0, 0)
    tmpl3 += struct.pack(">iI", int(LA1 * 1e6), int(LO1 * 1e6))
    tmpl3 += struct.pack(">B", 0x30)
    tmpl3 += struct.pack(">iI", int((LA1 - (NJ - 1) * DJ) * 1e6),
                         int((LO1 + (NI - 1) * DI) * 1e6))
    tmpl3 += struct.pack(">IIB", int(DI * 1e6), int(DJ * 1e6), 0)
    s3 = sec(3, struct.pack(">BIBBH", 0, NI * NJ, 0, 0, 0) + tmpl3)
    tmpl4 = struct.pack(">BBBBBHBBi", 0, 192, 2, 0, 0, 0, 0, 1, 24)
    tmpl4 += struct.pack(">BbI", 1, 0, 0) + struct.pack(">BbI", 255, 0, 0)
    tmpl4 += struct.pack(">BBB", 3, 7, 1)
    s4 = sec(4, struct.pack(">HH", 0, 1) + tmpl4)

    def sm16(v):  # GRIB sign-magnitude
        return (0x8000 | (-v)) if v < 0 else v

    bpv = 12
    s5 = sec(5, struct.pack(">IHfHHBB", NI * NJ, 0, 50.0,
                            sm16(-2), sm16(1), bpv, 0))
    s6 = sec(6, struct.pack(">B", 255))
    bits = "".join(format(k, f"0{bpv}b") for k in range(NI * NJ))
    bits += "0" * (-len(bits) % 8)
    s7 = sec(7, bytes(int(bits[i:i + 8], 2) for i in range(0, len(bits), 8)))
    body = s1 + s3 + s4 + s5 + s6 + s7 + b"7777"
    with open("data/ens_scaled.grib2", "wb") as f:
        f.write(b"GRIB" + struct.pack(">HBBQ", 0, 0, 2, 16 + len(body)) + body)


def shp_holes():
    outer = [(0, 0), (4, 0), (4, 4), (0, 4), (0, 0)]
    hole = [(1, 1), (1, 3), (3, 3), (3, 1), (1, 1)]
    parts = [outer, hole]
    pts = [p for ring in parts for p in ring]
    content = struct.pack("<i", 5)
    content += struct.pack("<4d", 0, 0, 4, 4)
    content += struct.pack("<ii", len(parts), len(pts))
    off = 0
    for ring in parts:
        content += struct.pack("<i", off)
        off += len(ring)
    for x, y in pts:
        content += struct.pack("<2d", x, y)

    def header(total_words):
        h = struct.pack(">i", 9994) + b"\x00" * 20 + struct.pack(">i", total_words)
        h += struct.pack("<ii", 1000, 5)
        h += struct.pack("<4d", 0, 0, 4, 4) + struct.pack("<4d", 0, 0, 0, 0)
        return h

    words = len(content) // 2
    with open("data/holes.shp", "wb") as f:
        f.write(header(50 + 4 + words) + struct.pack(">ii", 1, words) + content)
    with open("data/holes.shx", "wb") as f:
        f.write(header(50 + 4) + struct.pack(">ii", 50, words))
    field = (b"ZONE\x00\x00\x00\x00\x00\x00\x00" + b"N" + b"\x00" * 4 +
             bytes([12, 0]) + b"\x00" * 14)
    dbf = struct.pack("<BBBBIHH", 3, 126, 1, 1, 1, 65, 13)
    dbf += b"\x00" * 20 + field + b"\x0d"
    dbf += b" " + str(42).rjust(12).encode() + b"\x1a"
    with open("data/holes.dbf", "wb") as f:
        f.write(dbf)


if __name__ == "__main__":
    grib_scaled()
    shp_holes()
    print("wrote ens_scaled.grib2, holes.{shp,shx,dbf}")
