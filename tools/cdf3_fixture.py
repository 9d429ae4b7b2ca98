#!/usr/bin/env python3
"""NetCDF CLASSIC fixtures: data/classic1.nc (CDF-1, 32-bit offsets)
and data/classic2.nc (CDF-2, 64-bit offsets) with identical content,
plus data/classic_expected.parquet. Pure-stdlib writer straight from
the Unidata NetCDF Classic Format Specification — big-endian, header
(dims, gatts, vars) then fixed var data at 4-byte-aligned offsets.

Layout: lat(32) f8 descending, lon(56) f8 ascending,
v(lat, lon) f4 with value(r,c) = (r*19 + c*5) % 523, NaN where
(r + 2*c) % 13 == 0 (NaN travels as a real f4 NaN; the expected
parquet drops those rows per the converter contract).
"""
import math
import os
import struct

NLAT, NLON = 32, 56
LA0, LO0, RES = 48.0, -8.0, 0.1


def val(r, c):
    if (r + 2 * c) % 13 == 0:
        return float("nan")
    return float((r * 19 + c * 5) % 523)


def pad4(b: bytes) -> bytes:
    return b + b"\x00" * ((4 - len(b) % 4) % 4)


def name(s: str) -> bytes:
    b = s.encode()
    return struct.pack(">I", len(b)) + pad4(b)


def write_file(path, version):
    lats = [LA0 - i * RES for i in range(NLAT)]
    lons = [LO0 + j * RES for j in range(NLON)]
    grid = [val(r, c) for r in range(NLAT) for c in range(NLON)]

    off_w = "I" if version == 1 else "Q"
    begin_size = 4 if version == 1 else 8

    # var data payloads (each padded to 4)
    lat_data = pad4(struct.pack(f">{NLAT}d", *lats))
    lon_data = pad4(struct.pack(f">{NLON}d", *lons))
    v_data = pad4(struct.pack(f">{NLAT * NLON}f", *grid))

    def var_entry(nm, dimids, nc_type, vsize, begin):
        return (name(nm) + struct.pack(">I", len(dimids)) +
                b"".join(struct.pack(">I", d) for d in dimids) +
                struct.pack(">II", 0, 0) +          # ABSENT vatt_list
                struct.pack(">II", nc_type, vsize) +
                struct.pack(f">{off_w}", begin))

    # assemble header with dummy begins first to learn its length
    def header(begins):
        h = b"CDF" + struct.pack("B", version)
        h += struct.pack(">I", 0)                    # numrecs
        h += struct.pack(">II", 0x0A, 2)             # NC_DIMENSION x2
        h += name("lat") + struct.pack(">I", NLAT)
        h += name("lon") + struct.pack(">I", NLON)
        h += struct.pack(">II", 0, 0)                # ABSENT gatt_list
        h += struct.pack(">II", 0x0B, 3)             # NC_VARIABLE x3
        h += var_entry("lat", [0], 6, len(lat_data), begins[0])
        h += var_entry("lon", [1], 6, len(lon_data), begins[1])
        h += var_entry("v", [0, 1], 5, len(v_data), begins[2])
        return h

    hlen = len(header([0, 0, 0]))
    b0 = hlen + (4 - hlen % 4) % 4
    begins = [b0, b0 + len(lat_data), b0 + len(lat_data) + len(lon_data)]
    h = header(begins)
    with open(path, "wb") as f:
        f.write(h + b"\x00" * (b0 - len(h)))
        f.write(lat_data + lon_data + v_data)
    return lats, lons


def main():
    os.chdir(os.path.join(os.path.dirname(__file__), ".."))
    lats, lons = write_file("data/classic1.nc", 1)
    write_file("data/classic2.nc", 2)

    import duckdb
    rows = [(lats[r], lons[c], val(r, c))
            for r in range(NLAT) for c in range(NLON)
            if not math.isnan(val(r, c))]
    con = duckdb.connect()
    con.execute("CREATE TABLE t (latitude DOUBLE, longitude DOUBLE,"
                " v REAL)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    con.execute("COPY t TO 'data/classic_expected.parquet'"
                " (FORMAT PARQUET)")
    print(f"wrote data/classic{{1,2}}.nc and expected parquet"
          f" ({len(rows)} live cells)")


if __name__ == "__main__":
    main()
