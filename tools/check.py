#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check.py [sfDir] [verifyOutDir]

Reads each Spark result (parquet written by graft.Verify), runs the paired
oracle SQL from oracle_sql.json in DuckDB over the same sf tables, and
compares: column names (sorted), dtypes, row count, and exact values.
Both sides are materialized through DuckDB so dtype handling is symmetric.
Exit code = number of failing queries.
"""
import duckdb, glob, json, os, sys
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    dirs = sorted(d for d in os.listdir(out) if os.path.isdir(f"{out}/{d}"))
    n_fail = 0
    # cross-check against the registry manifest: a crashed query has no
    # output dir; a renamed/removed query leaves a stale one
    try:
        registered = sorted(json.load(open(f"{out}/queries.json")))
    except FileNotFoundError:
        registered = dirs
    for miss in sorted(set(registered) - set(dirs)):
        print(f"FAIL  {miss}: registered but produced no output (crashed in Verify?)")
        n_fail += 1
    for stale in sorted(set(dirs) - set(registered)):
        print(f"FAIL  {stale}: output dir exists but query is not registered (stale?)")
        n_fail += 1
    names = sorted(set(dirs) & set(registered))
    for name in names:
        files = glob.glob(f"{out}/{name}/*.parquet")
        if not files:
            print(f"FAIL  {name}: no spark output files"); n_fail += 1; continue
        sdf = con.execute(f"SELECT * FROM read_parquet('{out}/{name}/*.parquet')").fetchdf()
        if name not in oracle:
            print(f"SKIP  {name}: rows-only check, rows={len(sdf)}" +
                  ("  !! EMPTY" if len(sdf) == 0 else ""))
            if len(sdf) == 0: n_fail += 1
            continue
        try:
            odf = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL  {name}: oracle SQL error: {str(e)[:200]}"); n_fail += 1; continue
        sdf = sdf[sorted(sdf.columns)]
        odf = odf[sorted(odf.columns)]
        if list(sdf.columns) != list(odf.columns):
            print(f"FAIL  {name}: columns spark={list(sdf.columns)} oracle={list(odf.columns)}")
            n_fail += 1; continue
        if len(sdf) != len(odf):
            print(f"FAIL  {name}: rows spark={len(sdf)} oracle={len(odf)}"); n_fail += 1; continue
        bad, order_only = [], []
        for c in sdf.columns:
            a, b = sdf[c].values, odf[c].values
            if not eq(a, b):
                # distinguish value mismatch from row-order mismatch
                sa = sdf.sort_values(list(sdf.columns), ignore_index=True)[c].values
                sb = odf.sort_values(list(odf.columns), ignore_index=True)[c].values
                (order_only if eq(sa, sb) else bad).append(c)
        dt = [c for c in sdf.columns if str(sdf[c].dtype) != str(odf[c].dtype)]
        # zero-sign mismatches (-0.0 vs 0.0) survive == but not a bit-hash
        zs = [c for c in sdf.columns
              if sdf[c].dtype.kind == 'f' and odf[c].dtype.kind == 'f'
              and not np.array_equal(np.signbit(sdf[c].values), np.signbit(odf[c].values))]
        if bad or order_only or dt or zs:
            print(f"FAIL  {name}: value-mismatch cols={bad} order-mismatch cols={order_only} "
                  f"dtype-diff={dt} zero-sign-diff={zs}")
            for c in (bad + order_only)[:2]:
                i = first_diff(sdf[c].values, odf[c].values)
                print(f"      {c}[{i}]: spark={sdf[c].values[i]!r} oracle={odf[c].values[i]!r}")
            n_fail += 1
        else:
            print(f"ok    {name}: rows={len(sdf)}")
    print(f"== {len(names) - n_fail}/{len(names)} pass")
    sys.exit(min(n_fail, 99))

def eq(a, b):
    if a.dtype.kind == 'f' and b.dtype.kind == 'f':
        return np.array_equal(a, b, equal_nan=True)  # exact: driver hashes bits
    if a.dtype == object or b.dtype == object:
        return all((x == y) or (x is None and y is None) or
                   (isinstance(x, float) and isinstance(y, float) and
                    np.isnan(x) and np.isnan(y))
                   for x, y in zip(a.tolist(), b.tolist()))
    return np.array_equal(a, b)

def first_diff(a, b):
    for i, (x, y) in enumerate(zip(a.tolist(), b.tolist())):
        if x != y and not (x is None and y is None):
            return i
    return 0

if __name__ == "__main__":
    main()
