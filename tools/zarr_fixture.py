#!/usr/bin/env python3
"""Write a Zarr v2 store fixture + the expected long-form parquet.

Fully INDEPENDENT of the Scala reader/writer (graft.sources.zarr):
builds the store straight from the public Zarr v2 storage spec — no
zarr library, just JSON + zlib. Layout:

  data/uparea.zarr/.zgroup
  data/uparea.zarr/lat/{.zarray,0}      48 doubles, descending from 60.0
  data/uparea.zarr/lon/{.zarray,0}      80 doubles, ascending from 10.0
  data/uparea.zarr/uparea/{.zarray,i.j} 48x80 <f8, 16x32 chunks (3x3
                                        grid, right/bottom edge chunks
                                        padded with the NaN fill), zlib

value(r, c) = (r*31 + c*17) % 997 if (r+c) % 11 != 0 else NaN
(NaN plays the masked-cell role; the expected parquet drops those rows,
matching the converter contract's NaN→absent rule.)
"""
import json
import math
import os
import struct
import zlib

OUT = os.path.join(os.path.dirname(__file__), "..", "data", "uparea.zarr")
NLAT, NLON = 48, 80
CR, CC = 16, 32
LA0, LO0, RES = 60.0, 10.0, 0.025


def val(r, c):
    if (r + c) % 11 == 0:
        return float("nan")
    return float((r * 31 + c * 17) % 997)


def zarray(shape, chunks, dtype, compressor, fill):
    return json.dumps({
        "chunks": chunks, "compressor": compressor, "dtype": dtype,
        "fill_value": fill, "filters": None, "order": "C",
        "shape": shape, "zarr_format": 2,
    })


def main():
    os.makedirs(OUT, exist_ok=True)
    with open(os.path.join(OUT, ".zgroup"), "w") as f:
        f.write(json.dumps({"zarr_format": 2}))

    lats = [LA0 - i * RES for i in range(NLAT)]
    lons = [LO0 + j * RES for j in range(NLON)]
    for name, vec in (("lat", lats), ("lon", lons)):
        d = os.path.join(OUT, name)
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, ".zarray"), "w") as f:
            f.write(zarray([len(vec)], [len(vec)], "<f8", None, 0.0))
        with open(os.path.join(d, "0"), "wb") as f:
            f.write(struct.pack(f"<{len(vec)}d", *vec))

    d = os.path.join(OUT, "uparea")
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, ".zarray"), "w") as f:
        f.write(zarray([NLAT, NLON], [CR, CC], "<f8",
                       {"id": "zlib", "level": 6}, "NaN"))
    for ci in range((NLAT + CR - 1) // CR):
        for cj in range((NLON + CC - 1) // CC):
            cells = []
            for r in range(CR):
                for c in range(CC):
                    rr, cc2 = ci * CR + r, cj * CC + c
                    cells.append(val(rr, cc2) if rr < NLAT and cc2 < NLON
                                 else float("nan"))
            raw = struct.pack(f"<{len(cells)}d", *cells)
            with open(os.path.join(d, f"{ci}.{cj}"), "wb") as f:
                f.write(zlib.compress(raw, 6))

    import pyarrow as pa
    import pyarrow.parquet as pq
    rows = [(lats[r], lons[c], val(r, c))
            for r in range(NLAT) for c in range(NLON)
            if not math.isnan(val(r, c))]
    pq.write_table(pa.table({
        "latitude": pa.array([t[0] for t in rows], pa.float64()),
        "longitude": pa.array([t[1] for t in rows], pa.float64()),
        "uparea": pa.array([t[2] for t in rows], pa.float64()),
    }), os.path.join(os.path.dirname(OUT), "uparea_expected.parquet"))
    print(f"wrote uparea.zarr ({len(rows)} non-NaN cells), uparea_expected.parquet")


if __name__ == "__main__":
    main()
