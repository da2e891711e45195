#!/usr/bin/env python3
"""Dev-only harness mirroring the driver's correctness gate: run Verify's
parquet dumps against the DuckDB oracle SQL and diff. NOT part of the
shipped engine (the Scala library has zero Python deps); this exists so
oracle SQL is validated locally before the driver runs it.

Usage: python3 dev/check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, os, json, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Mirror the driver's canonicalization EXACTLY: columns sorted by
    name, then a raw-column lexsort. The driver's sort_values crashes on
    ndarray/list cells ('unhashable type: numpy.ndarray'), so we check for
    those up front and raise the same class of failure loudly — a query
    whose output has array/map cells can never pass the driver's gate."""
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df) == 0 or len(df.columns) == 0:
        return df.reset_index(drop=True)
    for c in df.columns:
        if df[c].dtype == object and df[c].map(
                lambda v: isinstance(v, (list, dict)) or hasattr(v, "__array__")).any():
            raise TypeError(
                f"column {c!r} holds array/struct cells — driver-incompatible "
                "output type; flatten to scalars (concat_ws/element_at/explode)")
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            got = canon(con.sql(f"SELECT * FROM parquet_scan('{out_dir}/{name}/*.parquet')").df())
        except Exception as e:
            print(f"FAIL {name}: spark output error: {e}")
            n_fail += 1
            continue
        try:
            exp = canon(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns spark={list(got.columns)} duck={list(exp.columns)}")
            n_fail += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows spark={len(got)} duck={len(exp)}")
            n_fail += 1
            continue
        gs, es = got.astype(str), exp.astype(str)
        if gs.equals(es):
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
        else:
            neq = (gs != es).any(axis=1)
            idx = list(gs.index[neq])[:3]
            print(f"FAIL {name}: {int(neq.sum())}/{len(got)} rows differ; first diffs:")
            for i in idx:
                for c in gs.columns:
                    if gs.at[i, c] != es.at[i, c]:
                        print(f"  row {i} col {c}: spark={gs.at[i, c]!r} duck={es.at[i, c]!r}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
