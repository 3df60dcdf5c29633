#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate: run each oracle SQL in
DuckDB over the sf parquet tables and diff against the Spark parquet dumps
produced by `sbt "runMain graft.Verify <sfDir> <outDir>"`.

Driver-faithful since round 9: the driver's compare is TYPE-SENSITIVE — it
sorts columns by name, stringifies values per pandas dtype, and hashes the
strings. A DuckDB HUGEINT (sum over BIGINT) arrives in pandas as float64 and
stringifies as "0.0" while Spark's int64 stringifies as "0": value-identical,
hash-different. Earlier versions of this script compared floats with
np.isclose and so missed exactly that class of failure (r7 vocab array hash,
r8 q_ts_volume_bars HUGEINT). Now: dtype mismatch between the oracle frame
and the Spark frame is a FAIL on its own, and all values are compared via
their pandas string forms — no numeric coercion that could mask a typing
difference.

Usage: python3 tools/local_verify.py <sfDir> <outDir>
       python3 tools/local_verify.py --selftest
"""
import json
import os
import sys

import numpy as np
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    return df.reindex(sorted(df.columns), axis=1).reset_index(drop=True)


def cell_str(v) -> str:
    # Stable stringification mirroring the driver's stringify+hash: numpy
    # arrays (list columns from parquet) render as python lists so the form
    # doesn't depend on numpy print options.
    if isinstance(v, np.ndarray):
        return str([cell_str(x) for x in v.tolist()])
    if isinstance(v, (list, tuple)):
        return str([cell_str(x) for x in v])
    return str(v)


def compare(name: str, oracle: pd.DataFrame, got: pd.DataFrame) -> list:
    """Return a list of human-readable failure strings (empty == pass)."""
    o, g = norm(oracle), norm(got)
    if list(o.columns) != list(g.columns):
        return [f"columns oracle={list(o.columns)} spark={list(g.columns)}"]
    if len(o) != len(g):
        return [f"rows oracle={len(o)} spark={len(g)}"]
    fails = []
    for c in o.columns:
        oc, gc = o[c], g[c]
        # dtype mismatch IS a failure: the driver hashes pandas string forms,
        # so float64 0.0 vs int64 0 diverges even with identical values.
        if str(oc.dtype) != str(gc.dtype):
            fails.append(f"dtype[{c}] oracle={oc.dtype} spark={gc.dtype}")
            continue
        os_ = oc.map(cell_str)
        gs_ = gc.map(cell_str)
        neq = (os_ != gs_)
        if neq.any():
            fails.append(
                f"values[{c}] {int(neq.sum())} diffs; "
                f"oracle={os_[neq].head(3).tolist()} "
                f"spark={gs_[neq].head(3).tolist()}")
    return fails


def selftest() -> int:
    import duckdb
    bad = 0
    # 1. HUGEINT hazard: DuckDB sum(BIGINT) -> HUGEINT -> pandas float64;
    #    a faithful compare MUST fail against Spark's int64 even though the
    #    values are numerically identical.
    hug = duckdb.sql(
        "SELECT sum(x) // 1 AS v FROM (SELECT CAST(0 AS BIGINT) AS x)").df()
    assert str(hug["v"].dtype) == "float64", f"expected float64, got {hug['v'].dtype}"
    spark_like = pd.DataFrame({"v": pd.array([0], dtype="int64")})
    if not compare("hugeint", hug, spark_like):
        print("SELFTEST FAIL: HUGEINT float64-vs-int64 not detected")
        bad += 1
    # 2. The cast fix makes it pass.
    cast = duckdb.sql(
        "SELECT CAST(sum(x) // 1 AS BIGINT) AS v "
        "FROM (SELECT CAST(0 AS BIGINT) AS x)").df()
    if compare("cast", cast, spark_like):
        print("SELFTEST FAIL: BIGINT-cast case should pass")
        bad += 1
    # 3. Identical float frames pass; last-ulp different floats fail
    #    (exact compare on purpose: we engineered determinism).
    a = pd.DataFrame({"f": [0.1, 0.2]})
    b = pd.DataFrame({"f": [0.1, np.nextafter(0.2, 1.0)]})
    if compare("floats-eq", a, a.copy()):
        print("SELFTEST FAIL: identical floats should pass")
        bad += 1
    if not compare("floats-ulp", a, b):
        print("SELFTEST FAIL: ulp-different floats should fail")
        bad += 1
    # 4. Array columns compare by stable list form.
    c1 = pd.DataFrame({"a": [np.array([1, 2])]})
    c2 = pd.DataFrame({"a": [np.array([1, 2])]})
    c3 = pd.DataFrame({"a": [np.array([1, 3])]})
    if compare("arr-eq", c1, c2):
        print("SELFTEST FAIL: equal arrays should pass")
        bad += 1
    if not compare("arr-neq", c1, c3):
        print("SELFTEST FAIL: different arrays should fail")
        bad += 1
    print("selftest:", "FAIL" if bad else "OK")
    return 1 if bad else 0


def main(sf_dir: str, out_dir: str) -> int:
    import duckdb
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
        fails = compare(name, oracle, got)
        if fails:
            print(f"FAIL {name}:")
            for f_ in fails:
                print("  " + f_)
            n_bad += 1
        else:
            print(f"PASS {name} ({len(oracle)} rows)")
    print(f"\n{len(oracles) - n_bad}/{len(oracles)} passed")
    return 1 if n_bad else 0


if __name__ == "__main__":
    if sys.argv[1:] == ["--selftest"]:
        sys.exit(selftest())
    sys.exit(main(sys.argv[1], sys.argv[2]))
