#!/usr/bin/env python3
"""Write a Zarr v3 store fixture + the expected long-form parquet.

Fully INDEPENDENT of the Scala reader (graft.sources.zarr): builds the
store straight from the public zarr-specs v3.0 documents — no zarr
library, just JSON + struct + gzip + a hand-rolled crc32c. Layout:

  data/uparea_v3.zarr/zarr.json              group metadata
  data/uparea_v3.zarr/lat/{zarr.json,c/0}    40 float64, bytes codec only
  data/uparea_v3.zarr/lon/{zarr.json,c/0}    64 float64
  data/uparea_v3.zarr/uparea/zarr.json       40x64 float64
  data/uparea_v3.zarr/uparea/c/<r>/<c>       SHARDS: outer chunks 16x32
      (3x2 grid, bottom edge padded), sharding_indexed with 8x16 inner
      chunks ([bytes le, gzip] inner codecs), index [bytes, crc32c] at
      the END. One inner chunk per shard (the last) is written as the
      all-1s EMPTY sentinel where its cells are all-NaN.

value(r, c) = (r*13 + c*7) % 641, NaN when (r+c) % 9 == 0; expected
parquet drops NaN rows (converter contract).
"""
import gzip as gzmod
import json
import math
import os
import struct

OUT = os.path.join(os.path.dirname(__file__), "..", "data", "uparea_v3.zarr")
NLAT, NLON = 40, 64
CR, CC = 16, 32          # outer (shard) chunk shape
IR, IC = 8, 16           # inner chunk shape
LA0, LO0, RES = 55.0, 5.0, 0.05


def crc32c(data: bytes) -> int:
    # Castagnoli CRC-32C, reflected, poly 0x1EDC6F41 (table-free bitwise)
    crc = 0xFFFFFFFF
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = (crc >> 1) ^ (0x82F63B78 if crc & 1 else 0)
    return crc ^ 0xFFFFFFFF


def val(r, c):
    if (r + c) % 9 == 0:
        return float("nan")
    return float((r * 13 + c * 7) % 641)


def array_json(shape, chunk_shape, codecs, fill="NaN"):
    return json.dumps({
        "zarr_format": 3, "node_type": "array",
        "shape": shape, "data_type": "float64",
        "chunk_grid": {"name": "regular",
                       "configuration": {"chunk_shape": chunk_shape}},
        "chunk_key_encoding": {"name": "default",
                               "configuration": {"separator": "/"}},
        "fill_value": fill, "codecs": codecs,
    })


BYTES = {"name": "bytes", "configuration": {"endian": "little"}}
GZIP = {"name": "gzip", "configuration": {"level": 6}}


def write(path, data):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    mode = "wb" if isinstance(data, bytes) else "w"
    with open(path, mode) as f:
        f.write(data)


def main():
    os.makedirs(OUT, exist_ok=True)
    write(os.path.join(OUT, "zarr.json"),
          json.dumps({"zarr_format": 3, "node_type": "group"}))

    lats = [LA0 - i * RES for i in range(NLAT)]
    lons = [LO0 + j * RES for j in range(NLON)]
    for name, vec in (("lat", lats), ("lon", lons)):
        write(os.path.join(OUT, name, "zarr.json"),
              array_json([len(vec)], [len(vec)], [BYTES], fill=0.0))
        write(os.path.join(OUT, name, "c", "0"),
              struct.pack(f"<{len(vec)}d", *vec))

    shard_codec = {"name": "sharding_indexed", "configuration": {
        "chunk_shape": [IR, IC],
        "codecs": [BYTES, GZIP],
        "index_codecs": [BYTES, {"name": "crc32c"}],
        "index_location": "end"}}
    write(os.path.join(OUT, "uparea", "zarr.json"),
          array_json([NLAT, NLON], [CR, CC], [shard_codec]))

    n_sr, n_sc = math.ceil(NLAT / CR), math.ceil(NLON / CC)
    ig_r, ig_c = CR // IR, CC // IC
    for sr in range(n_sr):
        for sc in range(n_sc):
            body = b""
            index = []
            for k in range(ig_r * ig_c):
                ir, ic = k // ig_c, k % ig_c
                cells = []
                all_nan = True
                for r in range(IR):
                    for c in range(IC):
                        gr = sr * CR + ir * IR + r
                        gc = sc * CC + ic * IC + c
                        v = val(gr, gc) if gr < NLAT and gc < NLON \
                            else float("nan")
                        if not math.isnan(v):
                            all_nan = False
                        cells.append(v)
                if all_nan:
                    # fill-only inner chunk: all-1s sentinel, no bytes
                    index.append((0xFFFFFFFFFFFFFFFF, 0xFFFFFFFFFFFFFFFF))
                else:
                    enc = gzmod.compress(
                        struct.pack(f"<{len(cells)}d", *cells), 6)
                    index.append((len(body), len(enc)))
                    body += enc
            idx = b"".join(struct.pack("<QQ", o, n) for o, n in index)
            idx += struct.pack("<I", crc32c(idx))
            write(os.path.join(OUT, "uparea", "c", str(sr), str(sc)),
                  body + idx)

    # 3-D var dis(time, lat, lon): 6 steps, unsharded [bytes, gzip]
    # chunks of (2, 16, 32) — the reference's (step, lat, lon) shape
    def val3(t, r, c):
        if (t + r + c) % 7 == 0:
            return float("nan")
        return float((t * 101 + r * 13 + c * 7) % 419)

    NT, TCH = 6, 2
    write(os.path.join(OUT, "time", "zarr.json"),
          array_json([NT], [NT], [BYTES], fill=0.0))
    write(os.path.join(OUT, "time", "c", "0"),
          struct.pack(f"<{NT}d", *[24.0 * (t + 1) for t in range(NT)]))
    write(os.path.join(OUT, "dis", "zarr.json"),
          array_json([NT, NLAT, NLON], [TCH, 16, 32], [BYTES, GZIP]))
    for ct in range(NT // TCH):
        for cr in range(math.ceil(NLAT / 16)):
            for cc in range(math.ceil(NLON / 32)):
                cells = []
                for t in range(TCH):
                    for r in range(16):
                        for c in range(32):
                            gt, gr, gc = ct * TCH + t, cr * 16 + r, cc * 32 + c
                            v = val3(gt, gr, gc) \
                                if gt < NT and gr < NLAT and gc < NLON \
                                else float("nan")
                            cells.append(v)
                write(os.path.join(OUT, "dis", "c", str(ct), str(cr), str(cc)),
                      gzmod.compress(struct.pack(f"<{len(cells)}d", *cells), 6))

    # expected parquet straight from the formula
    import duckdb
    rows = [(lats[r], lons[c], val(r, c))
            for r in range(NLAT) for c in range(NLON)
            if not math.isnan(val(r, c))]
    con = duckdb.connect()
    con.execute("CREATE TABLE t (latitude DOUBLE, longitude DOUBLE,"
                " uparea DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    con.execute("COPY t TO 'data/uparea_v3_expected.parquet'"
                " (FORMAT PARQUET)")
    rows3 = [(24.0 * (t + 1), lats[r], lons[c], val3(t, r, c))
             for t in range(NT) for r in range(NLAT) for c in range(NLON)
             if not math.isnan(val3(t, r, c))]
    con.execute("CREATE TABLE t3 (t DOUBLE, latitude DOUBLE,"
                " longitude DOUBLE, dis DOUBLE)")
    con.executemany("INSERT INTO t3 VALUES (?, ?, ?, ?)", rows3)
    con.execute("COPY t3 TO 'data/dis_v3_expected.parquet'"
                " (FORMAT PARQUET)")
    print(f"wrote {OUT} ({n_sr}x{n_sc} shards, {len(rows)} live cells;"
          f" 3-D dis with {len(rows3)} live cells) and expected parquets")


if __name__ == "__main__":
    main()
