#!/usr/bin/env python3
"""NetCDF CLASSIC record-variable fixtures: data/classic_rec.nc (CDF-2,
numrecs=7) and data/classic_rec_stream.nc (CDF-1, numrecs=STREAMING =
0xFFFFFFFF) with identical content, plus data/classic_rec_expected.parquet.

Pure-stdlib writer straight from the Unidata NetCDF Classic Format
Specification — this is the RECORD (unlimited-dimension) layout archive
time-series files use: after the fixed-size block, records interleave;
each record holds one record's slab of EVERY record variable in varid
order, each slab padded to 4 bytes (because there is more than one
record variable). Three record variables exercise the interleave:

  time(time) f8   — coordinate, slab 8 (no pad)
  s(time)    i2   — slab 2 -> PADDED to 4 (the rule under test)
  v(time, cell) f4 — slab 4*NCELL

plus a FIXED coordinate cell(cell) f8 before the record block.
value(r, c) = (r*31 + c*7) % 211, NaN where (r + 3*c) % 11 == 0.
"""
import math
import os
import struct

NREC, NCELL = 7, 39
T0, C0 = 1000.0, 5.0


def val(r, c):
    if (r + 3 * c) % 11 == 0:
        return float("nan")
    return float((r * 31 + c * 7) % 211)


def pad4(b: bytes) -> bytes:
    return b + b"\x00" * ((4 - len(b) % 4) % 4)


def name(s: str) -> bytes:
    b = s.encode()
    return struct.pack(">I", len(b)) + pad4(b)


def write_file(path, version, numrecs):
    times = [T0 + r * 3600.0 for r in range(NREC)]
    cells = [C0 + j * 0.5 for j in range(NCELL)]

    off_w = "I" if version == 1 else "Q"

    cell_data = pad4(struct.pack(f">{NCELL}d", *cells))

    # per-record slabs, each padded to 4 (multiple record vars)
    def rec_slabs(r):
        return [
            pad4(struct.pack(">d", times[r])),                      # time: 8
            pad4(struct.pack(">h", (r * 13) % 91)),                 # s: 2 -> 4
            pad4(struct.pack(f">{NCELL}f",
                             *[val(r, c) for c in range(NCELL)])),  # v
        ]
    slab_sizes = [len(s) for s in rec_slabs(0)]
    rec_size = sum(slab_sizes)

    def var_entry(nm, dimids, nc_type, vsize, begin):
        return (name(nm) + struct.pack(">I", len(dimids)) +
                b"".join(struct.pack(">I", d) for d in dimids) +
                struct.pack(">II", 0, 0) +          # ABSENT vatt_list
                struct.pack(">II", nc_type, vsize) +
                struct.pack(f">{off_w}", begin))

    def header(cell_begin, rec_begin):
        h = b"CDF" + struct.pack("B", version)
        h += struct.pack(">i", numrecs)
        h += struct.pack(">II", 0x0A, 2)             # NC_DIMENSION x2
        h += name("time") + struct.pack(">I", 0)     # UNLIMITED
        h += name("cell") + struct.pack(">I", NCELL)
        h += struct.pack(">II", 0, 0)                # ABSENT gatt_list
        h += struct.pack(">II", 0x0B, 4)             # NC_VARIABLE x4
        h += var_entry("cell", [1], 6, len(cell_data), cell_begin)
        h += var_entry("time", [0], 6, slab_sizes[0], rec_begin)
        h += var_entry("s", [0], 3, slab_sizes[1],
                       rec_begin + slab_sizes[0])
        h += var_entry("v", [0, 1], 5, slab_sizes[2],
                       rec_begin + slab_sizes[0] + slab_sizes[1])
        return h

    hlen = len(header(0, 0))
    cell_begin = hlen + (4 - hlen % 4) % 4
    rec_begin = cell_begin + len(cell_data)
    h = header(cell_begin, rec_begin)
    with open(path, "wb") as f:
        f.write(h + b"\x00" * (cell_begin - len(h)))
        f.write(cell_data)
        for r in range(NREC):
            f.write(b"".join(rec_slabs(r)))
    assert os.path.getsize(path) == rec_begin + NREC * rec_size
    return times, cells


def main():
    os.chdir(os.path.join(os.path.dirname(__file__), ".."))
    times, cells = write_file("data/classic_rec.nc", 2, NREC)
    write_file("data/classic_rec_stream.nc", 1, -1)

    import duckdb
    rows = [(times[r], cells[c], val(r, c))
            for r in range(NREC) for c in range(NCELL)
            if not math.isnan(val(r, c))]
    con = duckdb.connect()
    con.execute("CREATE TABLE t (t DOUBLE, cell DOUBLE, v REAL)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    con.execute("COPY t TO 'data/classic_rec_expected.parquet'"
                " (FORMAT PARQUET)")
    print(f"wrote data/classic_rec{{,_stream}}.nc and expected parquet"
          f" ({len(rows)} live cells of {NREC * NCELL})")


if __name__ == "__main__":
    main()
