#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: reads the Verify dump
(outDir/<name>/ parquet + oracle_sql.json), runs each oracle in DuckDB over
the same testdata tables, sorts columns by name + rows by all columns, and
compares values. Usage: check.py <sfDir> <outDir>"""
import json, math, sys
from pathlib import Path

import duckdb
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

marker = Path(outdir) / "SUBSET_RUN"
fresh = None  # names re-dumped by the last (subset) Verify run; None = all
if marker.exists():
    text = marker.read_text().strip()
    fresh = (set(n.strip() for n in text.split("=", 1)[1].split(",") if n.strip())
             if "=" in text else set())
    print(f"WARNING: {marker} present — Verify ran with {text}; unlisted"
          " queries hold STALE dumps and are reported as such, not compared."
          " Not a full gate run.")

oracle = json.loads(Path(f"{outdir}/oracle_sql.json").read_text())
results = {}
for name, sql in sorted(oracle.items()):
    rdir = Path(outdir) / name
    if fresh is not None and name not in fresh:
        results[name] = "STALE_SUBSET_RUN: dump not re-generated, not compared"
        continue
    if not rdir.exists():
        results[name] = "MISSING_RESULT"
        continue
    try:
        got = con.execute(f"SELECT * FROM '{rdir}/*.parquet'").fetchdf()
        exp = con.execute(sql).fetchdf()
    except Exception as e:
        results[name] = f"ERROR: {e}"
        continue
    got = got.reindex(sorted(got.columns), axis=1)
    exp = exp.reindex(sorted(exp.columns), axis=1)
    if list(got.columns) != list(exp.columns):
        results[name] = f"SCHEMA: got {list(got.columns)} vs {list(exp.columns)}"
        continue
    if len(got) != len(exp):
        results[name] = f"ROWS: got {len(got)} vs {len(exp)}"
        continue
    got = got.sort_values(by=list(got.columns), ignore_index=True)
    exp = exp.sort_values(by=list(exp.columns), ignore_index=True)
    mismatch = None
    for c in got.columns:
        a, b = got[c], exp[c]
        if str(a.dtype) != str(b.dtype):
            mismatch = f"DTYPE[{c}]: {a.dtype} vs {b.dtype}"
            break
        if a.dtype.kind == "f":
            bad = ~((a == b) | (a.isna() & b.isna()))
        else:
            bad = ~((a.astype(str) == b.astype(str)))
        if bad.any():
            i = bad.idxmax()
            mismatch = f"VALUE[{c}] row{i}: {a[i]!r} vs {b[i]!r} ({int(bad.sum())} bad)"
            break
    results[name] = mismatch or "OK"

npass = sum(1 for v in results.values() if v == "OK")
for name, v in sorted(results.items()):
    print(("PASS " if v == "OK" else "FAIL ") + name + ("" if v == "OK" else f"  {v}"))
print(f"\n{npass}/{len(results)} oracle-checked queries pass")
sys.exit(0 if npass == len(results) else 1)
