#!/usr/bin/env python3
"""Write the END-TO-END flood-integration GRIB2 fixtures + expected parquet.

Fully INDEPENDENT of the Scala reader (graft.sources.grib.Grib2File): the
byte layout is built straight from the public WMO FM 92 GRIB2 spec, same
method as tools/grib2_fixture.py but with a REAL-GRID, MULTI-STEP ensemble:

  data/e2e_cf.grib2 : 5 control messages  (template 4.1, type=1, number=0,
                      forecast time 24..120 h)
  data/e2e_pf.grib2 : 50 perturbed messages (type=3, numbers 1..10 x 5 steps)
  grid: 40 lat rows from 15.975 step 0.05 south, 40 lon cols from 12.025
        step 0.05 east — EXACTLY a window of the GloFAS 0.05-degree grid of
        /root/reference/auxiliary_data/flood/RP*thresholds_GloFASv40.nc, so
        the fixture ensemble joins the real threshold files cell-for-cell.
  value(m, step, j, i) = ((m*7 + step*13 + j*3 + i*5) % 41) * 50
        integers 0..2000 — exact in 16-bit simple packing (R=0,E=0,D=0) and
        spanning the window's real 2y/5y/20y thresholds (max ~1950), so
        exceedance probabilities vary across cells/steps/members.

The expected parquet (data/e2e_expected.parquet) is computed from the value
FORMULA, never by reading the GRIB bytes back: a Scala-side hash match
cross-validates both implementations of the format AND the lead-time
(octets 18-22) plumbing this fixture adds.
"""
import os
import struct

OUT = os.path.join(os.path.dirname(__file__), "..", "data")
NI, NJ = 40, 40
# micro-degrees, packed verbatim; coordinates derive as micro/1e6 in BOTH
# implementations so the doubles are bit-identical
LA1_U, LO1_U, D_U = 15_975_000, 12_025_000, 50_000
LA1, LO1, D = LA1_U / 1e6, LO1_U / 1e6, D_U / 1e6
MEMBERS = list(range(11))        # 0 = control, 1..10 perturbed
STEPS = [1, 2, 3, 4, 5]          # lead days -> forecast time 24*s hours
BPV = 16


def sec(num: int, body: bytes) -> bytes:
    return struct.pack(">IB", 5 + len(body), num) + body


def message(ens_type: int, number: int, step_days: int, values: list) -> bytes:
    s1 = sec(1, struct.pack(">HHBBBHBBBBBBB", 98, 0, 2, 1, 1,
                            2026, 1, 1, 0, 0, 0, 0, 1))
    tmpl3 = struct.pack(">BBIBIBIIIII", 6, 0, 0, 0, 0, 0, 0, NI, NJ, 0, 0)
    tmpl3 += struct.pack(">iI", LA1_U, LO1_U)                  # la1, lo1
    tmpl3 += struct.pack(">B", 0x30)                           # res flags
    tmpl3 += struct.pack(">iI", LA1_U - (NJ - 1) * D_U,
                         LO1_U + (NI - 1) * D_U)               # la2, lo2
    tmpl3 += struct.pack(">IIB", D_U, D_U, 0)                  # di dj scan
    s3 = sec(3, struct.pack(">BIBBH", 0, NI * NJ, 0, 0, 0) + tmpl3)
    # product template 4.1: time unit 1 (hour), forecast time 24*step_days
    tmpl4 = struct.pack(">BBBBBHBBi", 0, 192, 2, 0, 0, 0, 0, 1,
                        24 * step_days)
    tmpl4 += struct.pack(">BbI", 1, 0, 0)      # first fixed surface
    tmpl4 += struct.pack(">BbI", 255, 0, 0)    # second fixed surface
    tmpl4 += struct.pack(">BBB", ens_type, number, len(MEMBERS))
    s4 = sec(4, struct.pack(">HH", 0, 1) + tmpl4)
    s5 = sec(5, struct.pack(">IHfhhBB", len(values), 0, 0.0, 0, 0, BPV, 0))
    s6 = sec(6, struct.pack(">B", 255))
    s7 = sec(7, b"".join(struct.pack(">H", int(v)) for v in values))
    body = s1 + s3 + s4 + s5 + s6 + s7 + b"7777"
    return b"GRIB" + struct.pack(">HBBQ", 0, 0, 2, 16 + len(body)) + body


def values(m: int, step: int) -> list:
    return [((m * 7 + step * 13 + j * 3 + i * 5) % 41) * 50
            for j in range(NJ) for i in range(NI)]


def main():
    import pyarrow as pa
    import pyarrow.parquet as pq

    with open(os.path.join(OUT, "e2e_cf.grib2"), "wb") as f:
        for s in STEPS:
            f.write(message(1, 0, s, values(0, s)))
    with open(os.path.join(OUT, "e2e_pf.grib2"), "wb") as f:
        for s in STEPS:
            for m in MEMBERS[1:]:
                f.write(message(3, m, s, values(m, s)))

    rows = [("cf" if m == 0 else "pf", m, 24 * s,
             LA1 - j * D, LO1 + i * D, float(values(m, s)[j * NI + i]))
            for s in STEPS for m in MEMBERS
            for j in range(NJ) for i in range(NI)]
    table = pa.table({
        "data_type": pa.array([r[0] for r in rows], pa.string()),
        "number": pa.array([r[1] for r in rows], pa.int32()),
        "step_hours": pa.array([r[2] for r in rows], pa.int32()),
        "latitude": pa.array([r[3] for r in rows], pa.float64()),
        "longitude": pa.array([r[4] for r in rows], pa.float64()),
        "value": pa.array([r[5] for r in rows], pa.float64()),
    })
    pq.write_table(table, os.path.join(OUT, "e2e_expected.parquet"))
    print(f"wrote e2e_cf.grib2 ({len(STEPS)} msgs), e2e_pf.grib2 "
          f"({len(STEPS) * (len(MEMBERS) - 1)} msgs), e2e_expected.parquet "
          f"({len(rows)} rows)")


if __name__ == "__main__":
    main()
