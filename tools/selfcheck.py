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

fails, passes, rowsonly = [], [], []

# Engine-semantics fixture (r7 verdict #3): the slope_q6/r2_q6 staging
# assumes DuckDB `//` truncates toward zero on NEGATIVE operands like
# Spark DIV (it is NOT Python floor division). Pin it with the same
# synthetic decreasing series TimeSeriesSpec drives through the Spark
# pipeline — if a DuckDB upgrade flips `//` to floor semantics, this
# hard-fails before the driver ever sees a silent hash mismatch.
def _check_signed_div():
    def tdiv(a, b):
        q = abs(a) // abs(b)
        return q if (a < 0) == (b < 0) else -q
    win, npts = 24, 26
    cents = [100000 - 1370 * x + (x * 37) % 11 for x in range(npts)]
    expected, saw_inexact = [], False
    for end in range(win - 1, npts):
        xs = list(range(end - win + 1, end + 1))
        ys = [cents[x] for x in xs]
        n, sx, sy = win, sum(xs), sum(ys)
        sxy = sum(x * y for x, y in zip(xs, ys))
        sxx = sum(x * x for x in xs)
        syy = sum(y * y for y in ys)
        num, den = n * sxy - sx * sy, n * sxx - sx * sx
        deny = n * syy - sy * sy
        assert num < 0, "fixture must exercise a negative numerator"
        if abs(1000000 * num) % abs(den):
            saw_inexact = True
        q1 = tdiv(1000000 * num, den)
        expected.append((xs[-1], q1, tdiv(q1 * num, deny)))
    assert saw_inexact, "fixture must hit an inexact signed quotient"
    duck = con.execute(f"""
        WITH pts AS (SELECT x, 100000 - 1370*x + (x*37) %% 11 AS y
            FROM (SELECT unnest(range({npts})) AS x)),
        m AS (SELECT x, count(*) OVER w AS n, sum(x) OVER w AS sx,
              sum(y) OVER w AS sy, sum(x*y) OVER w AS sxy,
              sum(x*x) OVER w AS sxx,
              sum(CAST(y AS HUGEINT)*y) OVER w AS syy,
              row_number() OVER (ORDER BY x) AS rn
            FROM pts WINDOW w AS (ORDER BY x
              ROWS BETWEEN {win - 1} PRECEDING AND CURRENT ROW)),
        s AS (SELECT x, CAST(n*sxy - sx*sy AS HUGEINT) AS num,
              CAST(n*sxx - sx*sx AS HUGEINT) AS den,
              CAST(n AS HUGEINT)*syy - CAST(sy AS HUGEINT)*sy AS deny
            FROM m WHERE rn >= {win})
        SELECT x, CAST((1000000*num) // den AS BIGINT) AS q1,
          CAST(((1000000*num) // den * num) // deny AS BIGINT) AS r2
        FROM s ORDER BY x""".replace("%%", "%")).fetchall()
    if [tuple(r) for r in duck] != expected:
        fails.append(("_fixture_signed_div",
                      f"DuckDB // diverged from trunc-toward-zero on "
                      f"negative staged quotients: {duck} vs {expected}"))

_check_signed_div()

# Engine-semantics fixture #2: several exact-path embedding oracles
# (knn_brute, knn_hard_negatives, embed_neardup, embed_lsh_recall,
# knn_ivf_recall) rank/threshold on UNROUNDED list_cosine_similarity,
# while the Spark side accumulates left-to-right. Probed 2026-08: DuckDB's
# list_cosine_similarity is bit-identical to the explicit left-to-right
# fold (dot/(sqrt*sqrt), 0 mismatches over all 124,750 sf0.01 pairs), so
# the oracles are ulp-safe. If a DuckDB upgrade changes the accumulation
# (pairwise/SIMD reassociation), hash mismatches would otherwise appear as
# unexplained rank flips near ties — pin the equivalence loudly instead.
def _check_cosine_order():
    dim = con.execute("SELECT len(embedding) FROM embeddings LIMIT 1").fetchone()[0]
    def fold(x, y):
        return (f"list_reduce(list_prepend(CAST(0 AS DOUBLE), "
                f"list_transform(range({dim}), i -> {x}[i+1] * {y}[i+1])), "
                f"(p,q) -> p+q)")
    manual = (f"({fold('a.v','b.v')} / "
              f"(sqrt({fold('a.v','a.v')}) * sqrt({fold('b.v','b.v')})))")
    n, bad = con.execute(f"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                   FROM embeddings WHERE vec_id < 200)
        SELECT count(*),
               sum(CASE WHEN list_cosine_similarity(a.v, b.v) = {manual}
                        THEN 0 ELSE 1 END)
        FROM e a JOIN e b ON a.vec_id < b.vec_id""").fetchone()
    if bad:
        fails.append(("_fixture_cosine_order",
                      f"list_cosine_similarity diverged from the "
                      f"left-to-right fold on {bad}/{n} pairs — exact-path "
                      f"embedding oracles are no longer ulp-safe"))

_check_cosine_order()

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize timestamps to ns-free strings? keep as is; sort rows
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

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
