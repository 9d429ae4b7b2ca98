#!/usr/bin/env python3
"""Write GRIB2 ensemble fixtures + the expected long-form parquet.

Fully INDEPENDENT of the Scala reader (graft.sources.grib.Grib2File):
this builds the byte layout straight from the public WMO FM 92 GRIB2
spec — indicator section, identification (1), lat/lon grid template 3.0
(3), individual-ensemble product template 4.1 (4), simple packing
template 5.0 (5), no bitmap (6), big-endian packed data (7), "7777".
The expected parquet is computed from the value FORMULA, not by reading
the GRIB bytes back, so a Scala-side hash match cross-validates both
implementations of the format.

Fixture shape (mirrors the reference's cf/pf ensemble split,
io_managers.py:193-210):
  data/ens_cf.grib2 : 1 control message   (type=1, number=0)
  data/ens_pf.grib2 : 2 perturbed messages (type=3, number=1,2)
  grid: 3 lat rows from 60.0 step 0.5 south, 4 lon cols from 10.0
        step 0.5 east, scanning mode 0 (+i, -j, i fastest)
  value(m, j, i) = m*1000 + j*10 + i   (exact in 16-bit simple packing
        with R=0, E=0, D=0 — integer-valued doubles, no float drift)
"""
import os
import struct

OUT = os.path.join(os.path.dirname(__file__), "..", "data")
NI, NJ = 4, 3
LA1, LO1, DI, DJ = 60.0, 10.0, 0.5, 0.5
BPV = 16


def sec(num: int, body: bytes) -> bytes:
    return struct.pack(">IB", 5 + len(body), num) + body


def message(ens_type: int, number: int, values: list) -> bytes:
    # section 1: identification (centre 98/ECMWF, forecast data)
    s1 = sec(1, struct.pack(">HHBBBHBBBBBBB", 98, 0, 2, 1, 1,
                            2026, 1, 1, 0, 0, 0, 0, 1))
    # section 3: grid definition, template 3.0 regular lat/lon
    tmpl3 = struct.pack(">BBIBIBIIIII", 6, 0, 0, 0, 0, 0, 0, NI, NJ, 0, 0)
    tmpl3 += struct.pack(">iI", int(LA1 * 1e6), int(LO1 * 1e6))  # la1, lo1
    tmpl3 += struct.pack(">B", 0x30)                             # res flags
    tmpl3 += struct.pack(">iI", int((LA1 - (NJ - 1) * DJ) * 1e6),
                         int((LO1 + (NI - 1) * DI) * 1e6))       # la2, lo2
    tmpl3 += struct.pack(">IIB", int(DI * 1e6), int(DJ * 1e6), 0)  # di dj scan
    s3 = sec(3, struct.pack(">BIBBH", 0, NI * NJ, 0, 0, 0) + tmpl3)
    # section 4: product definition, template 4.1 individual ensemble fc
    tmpl4 = struct.pack(">BBBBBHBBi", 0, 192, 2, 0, 0, 0, 0, 1, 24)
    tmpl4 += struct.pack(">BbI", 1, 0, 0)      # first fixed surface
    tmpl4 += struct.pack(">BbI", 255, 0, 0)    # second fixed surface
    tmpl4 += struct.pack(">BBB", ens_type, number, 3)
    s4 = sec(4, struct.pack(">HH", 0, 1) + tmpl4)
    # section 5: simple packing, R=0 E=0 D=0, 16 bits
    s5 = sec(5, struct.pack(">IHfhhBB", NI * NJ, 0, 0.0, 0, 0, BPV, 0))
    # section 6: no bitmap
    s6 = sec(6, struct.pack(">B", 255))
    # section 7: big-endian 16-bit packed values
    s7 = sec(7, b"".join(struct.pack(">H", int(v)) for v in values))
    body = s1 + s3 + s4 + s5 + s6 + s7 + b"7777"
    total = 16 + len(body)
    s0 = b"GRIB" + struct.pack(">HBBQ", 0, 0, 2, total)
    return s0 + body


def values(m: int) -> list:
    return [m * 1000 + j * 10 + i for j in range(NJ) for i in range(NI)]


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    with open(os.path.join(OUT, "ens_cf.grib2"), "wb") as f:
        f.write(message(ens_type=1, number=0, values=values(0)))
    with open(os.path.join(OUT, "ens_pf.grib2"), "wb") as f:
        f.write(message(ens_type=3, number=1, values=values(1)))
        f.write(message(ens_type=3, number=2, values=values(2)))

    import pyarrow as pa
    import pyarrow.parquet as pq
    rows = [(m, LA1 - j * DJ, LO1 + i * DI, float(m * 1000 + j * 10 + i))
            for m in range(3) for j in range(NJ) for i in range(NI)]
    table = pa.table({
        "number": pa.array([r[0] for r in rows], pa.int32()),
        "latitude": pa.array([r[1] for r in rows], pa.float64()),
        "longitude": pa.array([r[2] for r in rows], pa.float64()),
        "dis24": pa.array([r[3] for r in rows], pa.float64()),
    })
    pq.write_table(table, os.path.join(OUT, "ens_expected.parquet"))
    print("wrote ens_cf.grib2, ens_pf.grib2, ens_expected.parquet")


if __name__ == "__main__":
    main()
