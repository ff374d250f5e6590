#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from oracle_sql.json in DuckDB over the raw tables in
<sfDir>, and compares: schema (column names), row count, and values
(columns sorted by name, rows sorted by all columns, floats rounded).
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: tuple(v) if isinstance(v, (list, tuple)) or
                              hasattr(v, "__len__") and not isinstance(v, (str, bytes)) else v)
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        if df[c].dtype == "float32":
            df[c] = df[c].astype("float64")
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def df_kind(s: pd.Series) -> str:
    k = s.dtype.kind  # i=int u=uint f=float O=object M=datetime b=bool
    return {"u": "i"}.get(k, k)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})")
            n_fail += 1
            continue
        try:
            exp = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_fail += 1
            continue
        g, x = canon(got), canon(exp)
        if list(g.columns) != list(x.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs oracle {list(x.columns)}")
            n_fail += 1
            continue
        # dtype-strict: the driver hashes raw values, so an int64 column on
        # one side vs float64 on the other (e.g. DuckDB HUGEINT sum -> float64)
        # hash-mismatches even when values are equal. Compare dtype KINDS
        # after canon's int-width/float32 normalization.
        kinds_g = [df_kind(g[c]) for c in g.columns]
        kinds_x = [df_kind(x[c]) for c in x.columns]
        if kinds_g != kinds_x:
            bad = [(c, a, b) for c, a, b in zip(g.columns, kinds_g, kinds_x) if a != b]
            print(f"FAIL {name}: dtype kind mismatch {bad} (spark vs oracle)")
            n_fail += 1
            continue
        if len(g) != len(x):
            print(f"FAIL {name}: rows {len(g)} vs oracle {len(x)}")
            n_fail += 1
            continue
        try:
            pd.testing.assert_frame_equal(g, x, check_dtype=False,
                                          check_exact=False, rtol=0, atol=1e-9)
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
        except AssertionError as e:
            print(f"FAIL {name}: value mismatch: {str(e)[:400]}")
            n_fail += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
