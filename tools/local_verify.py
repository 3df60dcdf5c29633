#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate: run each oracle SQL in
DuckDB over the sf parquet tables and diff against the Spark parquet dumps
produced by `sbt "runMain graft.Verify <sfDir> <outDir>"`.

Usage: python3 tools/local_verify.py <sfDir> <outDir>
"""
import json
import os
import sys

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # value-level compare: stringify with enough precision
    out = df.copy()
    for c in out.columns:
        if out[c].dtype == object:
            out[c] = out[c].astype(str)
    return out.reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    n_bad = 0
    for name, sql in sorted(oracles.items()):
        spark_path = os.path.join(out_dir, name)
        if not os.path.isdir(spark_path):
            print(f"FAIL {name}: no spark output dir")
            n_bad += 1
            continue
        try:
            oracle = con.sql(sql).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle error: {e}")
            n_bad += 1
            continue
        got = con.sql(f"SELECT * FROM read_parquet('{spark_path}/*.parquet')").df()
        o, g = norm(oracle), norm(got)
        if list(o.columns) != list(g.columns):
            print(f"FAIL {name}: columns oracle={list(o.columns)} spark={list(g.columns)}")
            n_bad += 1
            continue
        if len(o) != len(g):
            print(f"FAIL {name}: rows oracle={len(o)} spark={len(g)}")
            n_bad += 1
            continue
        diffs = []
        for c in o.columns:
            oc, gc = o[c], g[c]
            if oc.dtype.kind == "f" or gc.dtype.kind == "f":
                import numpy as np
                eq = np.isclose(oc.astype(float), gc.astype(float),
                                rtol=0, atol=0, equal_nan=True)
                # exact float compare on purpose: we engineered determinism
                if not eq.all():
                    diffs.append((c, (~eq).sum()))
            else:
                neq = (oc.astype(str) != gc.astype(str))
                if neq.any():
                    diffs.append((c, int(neq.sum())))
        if diffs:
            print(f"FAIL {name}: value diffs {diffs}")
            for c, _ in diffs[:2]:
                mask = o[c].astype(str) != g[c].astype(str)
                print("  oracle:", o.loc[mask, c].head(3).tolist())
                print("  spark :", g.loc[mask, c].head(3).tolist())
            n_bad += 1
        else:
            print(f"PASS {name} ({len(o)} rows)")
    print(f"\n{len(oracles) - n_bad}/{len(oracles)} passed")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
