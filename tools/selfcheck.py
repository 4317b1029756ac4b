#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB over the sf parquet tables, compare against the Spark parquet dumps
in the Verify output dir (columns sorted by name, rows sorted, values
compared cell-wise with exact + tolerant reporting). Dev tool only — not
part of the shipped library."""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np
import pyarrow.parquet as pq

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize timestamps to ns-free strings? keep as is; sort rows
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

fails, passes, rowsonly = [], [], []
for d in sorted(os.listdir(outdir)):
    p = os.path.join(outdir, d)
    if not os.path.isdir(p):
        continue
    files = glob.glob(f"{p}/*.parquet")
    got = pd.concat([pd.read_parquet(f) for f in files]) if files else pd.DataFrame()
    # Lint: the driver's hash canonicalization renders DuckDB DECIMAL finals
    # as float64 while Spark dumps them as Decimal objects — any decimal
    # column in a PUBLISHED schema is a latent hash mismatch. Hard-fail it
    # here so the dev loop catches it before the driver does (r6 lesson).
    dec_cols = [f.name for f in pq.read_schema(files[0])
                if "decimal" in str(f.type)] if files else []
    if dec_cols:
        fails.append((d, f"published decimal columns {dec_cols}: "
                         "republish as BIGINT/DOUBLE (driver hash trap)"))
        continue
    if d not in oracle:
        rowsonly.append((d, len(got)))
        continue
    try:
        exp = con.execute(oracle[d]).df()
    except Exception as e:
        fails.append((d, f"oracle SQL error: {e}"))
        continue
    g, e = canon(got.copy()), canon(exp.copy())
    if list(g.columns) != list(e.columns):
        fails.append((d, f"columns differ: spark={list(g.columns)} oracle={list(e.columns)}"))
        continue
    if len(g) != len(e):
        fails.append((d, f"row count differ: spark={len(g)} oracle={len(e)}"))
        continue
    ok = True
    for c in g.columns:
        gv, ev = g[c].values, e[c].values
        g_float = np.issubdtype(g[c].dtype, np.floating)
        e_float = np.issubdtype(e[c].dtype, np.floating)
        # A float column on exactly ONE side means the engines disagree on
        # the published type (e.g. Spark Decimal vs DuckDB float64) — the
        # driver hashes these differently even when values match. Fail hard
        # instead of float-coercing both sides (the r6 blind spot).
        if g_float != e_float:
            fails.append((d, f"col {c}: dtype split spark={g[c].dtype} "
                             f"oracle={e[c].dtype} (driver hashes these "
                             "differently even if values match)"))
            ok = False
            continue
        if g_float or e_float:
            gv2 = gv.astype(float); ev2 = ev.astype(float)
            both_nan = np.isnan(gv2) & np.isnan(ev2)
            exact = (gv2 == ev2) | both_nan
            if not exact.all():
                diff = np.abs(gv2 - ev2)
                mx = np.nanmax(diff[~exact]) if (~exact).any() else 0
                fails.append((d, f"col {c}: {int((~exact).sum())} float mismatches, max abs diff {mx:.3e}"))
                ok = False
        else:
            gs = pd.Series(gv).astype(str); es = pd.Series(ev).astype(str)
            neq = (gs != es).values
            if neq.any():
                i = int(np.argmax(neq))
                fails.append((d, f"col {c}: {int(neq.sum())} mismatches, first: spark={gs[i]!r} oracle={es[i]!r}"))
                ok = False
    if ok:
        passes.append((d, len(g)))

print(f"== PASS ({len(passes)}) ==")
for d, n in passes: print(f"  {d}: {n} rows")
print(f"== ROWS-ONLY ({len(rowsonly)}) ==")
for d, n in rowsonly:
    print(f"  {d}: {n} rows {'OK' if n > 0 else '** EMPTY **'}")
print(f"== FAIL ({len(fails)}) ==")
for d, m in fails: print(f"  {d}: {m}")
sys.exit(1 if fails else 0)
