#!/usr/bin/env python3
"""Synthesize an sf1-equivalent testdata dir (~6M lineitem rows) by
deterministic 10x replication of the driver's sf0.1 tables with
consistent key shifts, for the large-SF gate run (round-11 item: the
full gate had only ever run at <= sf0.1).

Every primary/foreign key shifts by copy_index * (max_key + 1), so
referential integrity and per-key distributions survive exactly;
non-key values replicate verbatim (10x density everywhere, the same
scaling a bigger TPC-H sf gives). Document texts get a per-copy suffix
token so the corpus does not become 90% exact duplicates (the dedup
families with brute-force oracles are excluded from the sf1 run anyway
-- they are oracle-cost-bound per CLAUDE.md -- but the text-statistics
families should see realistic, mostly-unique text). region/nation are
dimension constants and copy through.

Usage: python3 tools/sf1_gen.py [src_dir] [out_dir]
       (defaults /root/testdata/sf0.1 -> /tmp/graft_sf1)
"""
import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf1"
COPIES = 10


def load(name):
    return pq.read_table(os.path.join(SRC, name + ".parquet"))


def stride(tbl, col):
    return pc.max(tbl[col]).as_py() + 1


def shift(tbl, col, i, strd):
    idx = tbl.schema.get_field_index(col)
    shifted = pc.add(tbl[col], pa.scalar(i * strd, tbl.schema.field(col).type))
    return tbl.set_column(idx, tbl.schema.field(col), shifted)


def replicate(tbl, keyed, mutate=None):
    parts = []
    for i in range(COPIES):
        t = tbl
        for col, strd in keyed.items():
            t = shift(t, col, i, strd)
        if mutate is not None:
            t = mutate(t, i)
        parts.append(t)
    return pa.concat_tables(parts)


def write(name, tbl):
    pq.write_table(tbl.replace_schema_metadata(None),
                   os.path.join(OUT, name + ".parquet"))
    print(f"{name}: {tbl.num_rows} rows")


def main():
    os.makedirs(OUT, exist_ok=True)
    customer = load("customer")
    supplier = load("supplier")
    part = load("part")
    orders = load("orders")
    lineitem = load("lineitem")
    events = load("events")
    documents = load("documents")
    embeddings = load("embeddings")

    ck = stride(customer, "c_custkey")
    sk = stride(supplier, "s_suppkey")
    pk = stride(part, "p_partkey")
    ok = stride(orders, "o_orderkey")
    ek = stride(events, "event_id")
    uk = stride(events, "user_id")
    dk = stride(documents, "doc_id")
    vk = stride(embeddings, "vec_id")

    write("region", load("region"))
    write("nation", load("nation"))
    write("customer", replicate(customer, {"c_custkey": ck}))
    write("supplier", replicate(supplier, {"s_suppkey": sk}))
    write("part", replicate(part, {"p_partkey": pk}))
    write("orders", replicate(orders, {"o_orderkey": ok, "o_custkey": ck}))
    write("lineitem", replicate(
        lineitem, {"l_orderkey": ok, "l_partkey": pk, "l_suppkey": sk}))
    write("events", replicate(events, {"event_id": ek, "user_id": uk}))

    def doc_mutate(t, i):
        if i == 0:
            return t
        suffix = f" c{i}"
        ti = t.schema.get_field_index("text")
        ni = t.schema.get_field_index("n_chars")
        text = pc.binary_join_element_wise(
            t["text"], pa.scalar(suffix), "")
        nchars = pc.add(t["n_chars"], pa.scalar(len(suffix), pa.int64()))
        t = t.set_column(ti, t.schema.field("text"), text)
        return t.set_column(ni, t.schema.field("n_chars"), nchars)

    write("documents", replicate(documents, {"doc_id": dk}, doc_mutate))
    write("embeddings", replicate(embeddings, {"vec_id": vk}))


if __name__ == "__main__":
    main()
