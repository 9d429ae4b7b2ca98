#!/usr/bin/env python3
"""WKB polygon fixture: packs the basins_expected.parquet rings into
ISO WKB (one single-ring polygon per zone, both byte orders exercised)
and writes data/basins_wkb.parquet (zone, wkb, plus the source xs/ys
for the oracle). Independent pure-stdlib WKB writer — the Scala decode
expression (functions/WkbPolygon) must reproduce xs/ys exactly, so the
q117 hash gate cross-validates both implementations of the spec
(OGC 06-103r4 §8; byte order 0=XDR big-endian, 1=NDR little-endian;
type 3 = Polygon, rings of (x, y) float64 pairs).
"""
import struct

import duckdb

rows = duckdb.sql(
    "SELECT record, zone, xs, ys FROM 'data/basins_expected.parquet'"
    " WHERE part = 0 ORDER BY record").fetchall()

out = []
for record, zone, xs, ys in rows:
    # alternate byte order per record so both paths are exercised
    little = record % 2 == 1
    bo = "<" if little else ">"
    wkb = struct.pack("B", 1 if little else 0)
    wkb += struct.pack(bo + "I", 3)          # geometry type: Polygon
    wkb += struct.pack(bo + "I", 1)          # one ring (exterior)
    wkb += struct.pack(bo + "I", len(xs))    # points in ring
    for x, y in zip(xs, ys):
        wkb += struct.pack(bo + "dd", x, y)
    out.append((record, zone, wkb, list(xs), list(ys)))

con = duckdb.connect()
con.execute("""
    CREATE TABLE t (record INT, zone BIGINT, wkb BLOB,
                    xs DOUBLE[], ys DOUBLE[])""")
con.executemany("INSERT INTO t VALUES (?, ?, ?, ?, ?)", out)
con.execute("COPY t TO 'data/basins_wkb.parquet' (FORMAT PARQUET)")
print(f"wrote data/basins_wkb.parquet ({len(out)} polygons,"
      f" {sum(1 for r in out if r[0] % 2 == 1)} little-endian)")
