#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (Spark output), runs the matching
oracle SQL from oracle_sql.json in DuckDB against the sfDir parquet tables,
sorts columns by name, sorts rows, and compares DTYPE-SENSITIVELY. This is
the builder's pre-flight loop, not shipped code.

Fidelity notes (learned from CORRECTNESS_r04):
- The driver's compare hashes stringified values, so a DuckDB HUGEINT
  (SUM(BIGINT)) arriving as pandas float64 ("0.0") fails against Spark's
  int64 ("0") EVEN WHEN VALUES MATCH. The old check here compared floats
  by value and waved four such queries through. Dtype KIND must match.
- The driver row-sorts EVERY output (including no-oracle, rows-only
  entries) with pandas sort_values; an ARRAY column is unhashable there
  and errors the whole entry (q75_r04). So every output — oracle or not —
  must survive a pandas row sort.
"""
import json, sys, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if np.issubdtype(df[c].dtype, np.datetime64):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif df[c].dtype == object:
            df[c] = df[c].apply(lambda v: str(v) if not isinstance(v, (bytes,)) else v.hex())
    # the driver canonicalizes row order itself — mimic it so an output
    # whose ORDER BY disagrees with the oracle's still compares, and one
    # that pandas cannot sort (array/struct column) fails HERE, not there
    df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    # union of produced dirs and declared oracles: an oracle entry whose
    # Spark run crashed before writing its dir must surface as MISSING,
    # not silently vanish from the report
    dirs = {d.rstrip("/").split("/")[-1]: d
            for d in sorted(glob.glob(f"{out_dir}/*/"))}
    for name in sorted(set(dirs) | set(oracles)):
        files = glob.glob(f"{dirs[name]}/*.parquet") if name in dirs else []
        if not files:
            results[name] = "MISSING spark output"
            continue
        try:
            got = pd.concat([pd.read_parquet(f) for f in sorted(files)], ignore_index=True)
            g = norm(got)
        except Exception as ex:
            results[name] = f"UNSORTABLE/UNREADABLE output ({type(ex).__name__}: {ex})"
            continue
        if name not in oracles:
            results[name] = f"PASS (rows-only: {len(g)} rows)" if len(g) else "EMPTY rows-only output"
            continue
        try:
            e = norm(con.execute(oracles[name]).df())
        except Exception as ex:
            results[name] = f"ORACLE ERROR {type(ex).__name__}: {ex}"
            continue
        if list(g.columns) != list(e.columns):
            results[name] = f"SCHEMA got={list(g.columns)} exp={list(e.columns)}"
            continue
        if len(g) != len(e):
            results[name] = f"ROWS got={len(g)} exp={len(e)}"
            continue
        bad = None
        for c in g.columns:
            if g[c].dtype.kind != e[c].dtype.kind:
                bad = (f"DTYPE col={c} got={g[c].dtype} exp={e[c].dtype} — the "
                       "driver's stringified hash will NOT match (HUGEINT? "
                       "cast the oracle column to BIGINT)")
                break
            gv, ev = g[c].values, e[c].values
            if np.issubdtype(g[c].dtype, np.floating):
                neq = ~((pd.isna(gv) & pd.isna(ev)) | (gv == ev))
            else:
                neq = ~((pd.isna(gv) & pd.isna(ev)) | (gv.astype(str) == ev.astype(str)))
            if neq.any():
                i = int(np.argmax(neq))
                bad = f"VALUE col={c} row={i} got={gv[i]!r} exp={ev[i]!r} ({int(neq.sum())} diffs)"
                break
        results[name] = bad or "PASS"
    npass = sum(1 for v in results.values() if v.startswith("PASS"))
    for k, v in sorted(results.items()):
        print(("✓ " if v.startswith("PASS") else "✗ ") + k +
              ("" if v == "PASS" else f"  {v}"))
    print(f"\n{npass}/{len(results)} PASS")
    return 0 if npass == len(results) else 1

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
