#!/usr/bin/env python3
"""Write an ESRI shapefile fixture (.shp/.shx/.dbf) + expected parquet.

Fully INDEPENDENT of the Scala reader (graft.sources.shp.Shapefile):
bytes built straight from the public ESRI Shapefile Technical
Description and dBASE III spec. Content: 25 concave L-shaped "basin"
polygons (the q73 family — notch points defeat bbox joins), zone ids in
the HYBAS_ID numeric dbf field, polygon k at offset
(ox, oy) = (floor(k/5)*2, (k%5)*2), vertices:

  (ox,oy) (ox+1.5,oy) (ox+1.5,oy+0.5) (ox+0.5,oy+0.5)
  (ox+0.5,oy+1.5) (ox,oy+1.5)  [closed back to (ox,oy)]

HYBAS_ID(k) = 7000000000 + k (realistic HydroSHEDS-sized ids — forces
the reader's long path). Expected parquet holds one row per ring with
the vertex arrays, computed from the formula.
"""
import os
import struct

OUT = os.path.join(os.path.dirname(__file__), "..", "data")
N = 25


def poly(k):
    ox, oy = (k // 5) * 2.0, (k % 5) * 2.0
    xs = [ox, ox + 1.5, ox + 1.5, ox + 0.5, ox + 0.5, ox, ox]
    ys = [oy, oy, oy + 0.5, oy + 0.5, oy + 1.5, oy + 1.5, oy]
    return xs, ys  # closed ring, shapefile convention (clockwise not enforced here)


def record_content(k):
    xs, ys = poly(k)
    n = len(xs)
    content = struct.pack("<i", 5)  # Polygon
    content += struct.pack("<4d", min(xs), min(ys), max(xs), max(ys))
    content += struct.pack("<ii", 1, n)  # numParts, numPoints
    content += struct.pack("<i", 0)      # part 0 starts at 0
    for x, y in zip(xs, ys):
        content += struct.pack("<2d", x, y)
    return content


def main():
    os.makedirs(OUT, exist_ok=True)
    recs = [record_content(k) for k in range(N)]

    all_xs = [x for k in range(N) for x in poly(k)[0]]
    all_ys = [y for k in range(N) for y in poly(k)[1]]
    bbox = (min(all_xs), min(all_ys), max(all_xs), max(all_ys))

    def header(total_words, shape_type):
        h = struct.pack(">i", 9994) + b"\x00" * 20 + struct.pack(">i", total_words)
        h += struct.pack("<ii", 1000, shape_type)
        h += struct.pack("<4d", *bbox)
        h += struct.pack("<4d", 0, 0, 0, 0)  # z/m ranges
        return h

    # .shp
    shp_body = b""
    offsets = []
    pos_words = 50  # header = 100 bytes = 50 words
    for i, c in enumerate(recs):
        offsets.append((pos_words, len(c) // 2))
        shp_body += struct.pack(">ii", i + 1, len(c) // 2) + c
        pos_words += 4 + len(c) // 2
    with open(os.path.join(OUT, "basins.shp"), "wb") as f:
        f.write(header(pos_words, 5) + shp_body)

    # .shx
    shx_body = b"".join(struct.pack(">ii", off, ln) for off, ln in offsets)
    with open(os.path.join(OUT, "basins.shx"), "wb") as f:
        f.write(header(50 + len(shx_body) // 2, 5) + shx_body)

    # .dbf: one numeric field HYBAS_ID, width 12
    field = b"HYBAS_ID\x00\x00\x00" + b"N" + b"\x00" * 4 + bytes([12, 0]) + b"\x00" * 14
    header_size = 32 + 32 + 1
    record_size = 1 + 12
    dbf = struct.pack("<BBBBIHH", 3, 126, 1, 1, N, header_size, record_size)
    dbf += b"\x00" * 20 + field + b"\x0d"
    for k in range(N):
        dbf += b" " + str(7000000000 + k).rjust(12).encode("ascii")
    dbf += b"\x1a"
    with open(os.path.join(OUT, "basins.dbf"), "wb") as f:
        f.write(dbf)

    import pyarrow as pa
    import pyarrow.parquet as pq
    rows = [(k + 1, 7000000000 + k, 0, poly(k)[0], poly(k)[1]) for k in range(N)]
    pq.write_table(pa.table({
        "record": pa.array([r[0] for r in rows], pa.int32()),
        "zone": pa.array([r[1] for r in rows], pa.int64()),
        "part": pa.array([r[2] for r in rows], pa.int32()),
        "xs": pa.array([r[3] for r in rows], pa.list_(pa.float64())),
        "ys": pa.array([r[4] for r in rows], pa.list_(pa.float64())),
    }), os.path.join(OUT, "basins_expected.parquet"))
    print(f"wrote basins.shp/.shx/.dbf ({N} polygons), basins_expected.parquet")


if __name__ == "__main__":
    main()
