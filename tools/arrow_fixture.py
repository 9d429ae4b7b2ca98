#!/usr/bin/env python3
"""Arrow IPC fixture for the graft-arrow DSv2 source.

Writes data/metrics.arrow — an Arrow IPC FILE (Feather v2 container,
uncompressed) with FOUR record batches of 250 rows each — and
data/arrow_expected.parquet holding the same formula-derived values.
The Scala reader (sources/arrow via /opt/spark's bundled arrow-vector)
is an independent consumer of the pyarrow-written bytes; q114's hash
match against the expected parquet cross-validates the batch walk,
type mapping, and null handling end-to-end.

Values are formula-derived and exact:
  id       = i                      (int64)
  sensor   = 's' + str(i % 7)      (utf8; null when i % 50 == 49)
  reading  = ((i * 31) % 997) / 4.0 (float64, exact quarters)
  flag     = (i % 3 == 0)          (bool)
"""
import pyarrow as pa
import pyarrow.parquet as pq

N, BATCH = 1000, 250

ids = list(range(N))
sensors = [None if i % 50 == 49 else f"s{i % 7}" for i in ids]
readings = [((i * 31) % 997) / 4.0 for i in ids]
flags = [i % 3 == 0 for i in ids]

schema = pa.schema([
    ("id", pa.int64()),
    ("sensor", pa.utf8()),
    ("reading", pa.float64()),
    ("flag", pa.bool_()),
])

batches = [
    pa.record_batch(
        [pa.array(col[lo:lo + BATCH], typ) for col, typ in (
            (ids, pa.int64()), (sensors, pa.utf8()),
            (readings, pa.float64()), (flags, pa.bool_()))],
        schema=schema)
    for lo in range(0, N, BATCH)
]

with pa.OSFile("data/metrics.arrow", "wb") as sink:
    with pa.ipc.new_file(sink, schema) as writer:
        for b in batches:
            writer.write_batch(b)

# same content, zstd-compressed buffers (IPC body compression) — the
# reader must decode transparently via arrow's compression factory
opts = pa.ipc.IpcWriteOptions(compression="zstd")
with pa.OSFile("data/metrics_zstd.arrow", "wb") as sink:
    with pa.ipc.new_file(sink, schema, options=opts) as writer:
        for b in batches:
            writer.write_batch(b)

pq.write_table(pa.Table.from_batches(batches), "data/arrow_expected.parquet")
print(f"wrote data/metrics.arrow ({len(batches)} batches x {BATCH} rows)"
      " and data/arrow_expected.parquet")
