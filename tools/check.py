#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (Spark output), runs the matching
oracle SQL from oracle_sql.json in DuckDB against the sfDir parquet tables,
sorts columns by name, and compares row-by-row. Reports per-query PASS/FAIL
with first diffs. This is the builder's pre-flight loop, not shipped code.
"""
import json, sys, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes a bit: datetimes -> iso strings, floats stay
    for c in df.columns:
        if np.issubdtype(df[c].dtype, np.datetime64):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif df[c].dtype == object:
            df[c] = df[c].apply(lambda v: str(v) if not isinstance(v, (bytes,)) else v.hex())
    return df.reset_index(drop=True)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name, sql in sorted(oracles.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            results[name] = "MISSING spark output"
            continue
        try:
            got = pd.concat([pd.read_parquet(f) for f in sorted(files)], ignore_index=True)
            exp = con.execute(sql).df()
        except Exception as e:
            results[name] = f"ERROR {type(e).__name__}: {e}"
            continue
        g, e = norm(got), norm(exp)
        if list(g.columns) != list(e.columns):
            results[name] = f"SCHEMA got={list(g.columns)} exp={list(e.columns)}"
            continue
        if len(g) != len(e):
            results[name] = f"ROWS got={len(g)} exp={len(e)}"
            continue
        bad = None
        for c in g.columns:
            gv, ev = g[c].values, e[c].values
            if np.issubdtype(g[c].dtype, np.floating) or np.issubdtype(e[c].dtype, np.floating):
                neq = ~((pd.isna(gv) & pd.isna(ev)) | (gv == ev))
            else:
                neq = ~((pd.isna(gv) & pd.isna(ev)) | (gv.astype(str) == ev.astype(str)))
            if neq.any():
                i = int(np.argmax(neq))
                bad = f"VALUE col={c} row={i} got={gv[i]!r} exp={ev[i]!r} ({int(neq.sum())} diffs)"
                break
        results[name] = bad or "PASS"
    npass = sum(1 for v in results.values() if v == "PASS")
    for k, v in sorted(results.items()):
        print(("✓ " if v == "PASS" else "✗ ") + k + ("" if v == "PASS" else f"  {v}"))
    print(f"\n{npass}/{len(results)} PASS")
    return 0 if npass == len(results) else 1

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
