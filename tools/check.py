#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tool only, not
part of the shipped library): load Verify's parquet dumps, run each
oracle SQL in DuckDB over the same testdata tables, and compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.reset_index(drop=True)

def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        got = canon(pd.concat([pd.read_parquet(f) for f in sorted(files)]))
        try:
            want = canon(con.execute(oracle[name]).df())
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); n_fail += 1; continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}"); n_fail += 1; continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}"); n_fail += 1; continue
        bad = None
        for c in got.columns:
            g, w = got[c], want[c]
            try:
                gv, wv = g.to_numpy(), w.to_numpy()
                eq = pd.Series(gv == wv) | (g.isna().reset_index(drop=True) & w.isna().reset_index(drop=True))
            except Exception:
                eq = g.astype(str) == w.astype(str)
            if not eq.all():
                i = int(eq.idxmin()); bad = (c, i, g.iloc[i], w.iloc[i]); break
        if bad:
            c, i, gv, wv = bad
            print(f"FAIL {name}: col {c} row {i}: spark={gv!r} duckdb={wv!r}"); n_fail += 1
        else:
            # dtype check: driver hash may be sensitive to physical types
            dt = [(c, str(got[c].dtype), str(want[c].dtype)) for c in got.columns
                  if str(got[c].dtype) != str(want[c].dtype)]
            note = f" [dtype diff: {dt}]" if dt else ""
            print(f"PASS {name} ({len(got)} rows){note}"); n_pass += 1
    for name in sorted(set(os.path.basename(d) for d in glob.glob(f"{out_dir}/*") if os.path.isdir(d)) - set(oracle)):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        n = sum(len(pd.read_parquet(f)) for f in files) if files else 0
        print(f"INFO {name}: no oracle, rows={n}")
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
