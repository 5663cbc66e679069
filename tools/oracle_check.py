#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/oracle_check.py [--exact] <verify_out_dir> <sf_dir>

Reads <verify_out_dir>/oracle_sql.json, registers each fixture parquet as a
DuckDB view named after the table, runs each oracle query, and compares
against the Spark result parquet at <verify_out_dir>/<name>/ — columns
sorted by name, rows sorted, floats compared with relative tolerance.

--exact compares floats bit-for-bit — STRICTER than the driver, whose hash
demonstrably tolerates 1-ulp float diffs (ann_cosine_topk / ml_standardize /
q14_running_sum differ by an ulp here yet hash green in CORRECTNESS_r03).
What the driver does NOT tolerate is a dtype-class mismatch: q18_case_agg was
red three rounds because DuckDB's sum(BIGINT) returns HUGEINT → pandas
float64 ("976.0") vs Spark's int64 ("976"). Both modes therefore run a
dtype audit; treat a dtype FAIL as a certain driver red, and a --exact
float mismatch beyond ~1 ulp as a probable one.
"""
import json
import math
import sys

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

EXACT = False


def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def approx_eq(a, b):
    a, b = norm(a), norm(b)
    if isinstance(a, float) and isinstance(b, (int, float)):
        b = float(b)
        if EXACT or math.isinf(a) or math.isinf(b):
            return a == b
        return abs(a - b) <= 1e-6 * max(1.0, abs(a), abs(b))
    if isinstance(b, float) and isinstance(a, int):
        return approx_eq(float(a), b)
    return a == b


def main():
    global EXACT
    args = [a for a in sys.argv[1:] if a != "--exact"]
    EXACT = "--exact" in sys.argv[1:]
    out_dir, sf_dir = args[0], args[1]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    # driver's weaker rows-only check for queries without oracle SQL
    import os
    dumped = {d for d in os.listdir(out_dir) if os.path.isdir(f"{out_dir}/{d}")}
    for name in sorted(dumped - set(oracles)):
        try:
            n = con.execute(
                f"SELECT count(*) FROM read_parquet('{out_dir}/{name}/*.parquet')"
            ).fetchone()[0]
            # replicate the driver's pandas row-sort: it crashes on
            # array-typed cells, so every dumped column must be sortable
            import pandas as pd
            df = pd.read_parquet(f"{out_dir}/{name}")
            df.sort_values(list(df.columns))
        except Exception as e:
            print(f"FAIL {name} (rows-only): {e}")
            n_fail += 1
            continue
        if n > 0:
            print(f"PASS {name} (rows-only, {n} rows)")
            n_pass += 1
        else:
            print(f"FAIL {name} (rows-only): 0 rows")
            n_fail += 1
    for name, sql in sorted(oracles.items()):
        try:
            spark_rel = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"
            )
            spark_cols = [c[0] for c in spark_rel.description]
            spark_rows = spark_rel.fetchall()
            oracle_rel = con.execute(sql)
            oracle_cols = [c[0] for c in oracle_rel.description]
            oracle_rows = oracle_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        if sorted(spark_cols) != sorted(oracle_cols):
            print(f"FAIL {name}: columns {sorted(spark_cols)} != {sorted(oracle_cols)}")
            n_fail += 1
            continue
        # dtype audit: the DRIVER's hash is dtype/format-sensitive (a
        # DuckDB HUGEINT that pandas turns into float64 hashes as "976.0"
        # vs Spark's int64 "976" — equal values, red hash). Compare the
        # pandas dtypes both sides materialize to and fail on mismatch.
        import pandas as pd
        s_dt = pd.read_parquet(f"{out_dir}/{name}").dtypes
        o_dt = con.execute(sql).df().dtypes
        # datetime64[ns] vs [us] and int/float widths are driver-benign
        # (its value normalization collapses them); int-vs-float/object is
        # the class that flips its hash (q18: HUGEINT→float64 vs int64)
        kind = lambda d: str(d).split("[")[0].rstrip("0123456789")
        dt_diff = [
            (c, str(s_dt[c]), str(o_dt[c]))
            for c in sorted(spark_cols)
            if str(s_dt[c]) != str(o_dt[c])
        ]
        dt_bad = [t for t in dt_diff if kind(t[1]) != kind(t[2])]
        for t in [t for t in dt_diff if t not in dt_bad]:
            print(f"WARN {name}: dtype width differs (likely benign): {t}")
        if dt_bad:
            print(f"FAIL {name}: dtype kind mismatch (driver hash hazard): {dt_bad}")
            n_fail += 1
            continue
        # reorder both to sorted column order, then sort rows
        s_ix = [spark_cols.index(c) for c in sorted(spark_cols)]
        o_ix = [oracle_cols.index(c) for c in sorted(oracle_cols)]
        key = lambda r: tuple((x is None, "NaN" if isinstance(x, float) and math.isnan(x) else x) for x in r)
        s_rows = sorted([tuple(r[i] for i in s_ix) for r in spark_rows], key=key)
        o_rows = sorted([tuple(r[i] for i in o_ix) for r in oracle_rows], key=key)
        if len(s_rows) != len(o_rows):
            print(f"FAIL {name}: row count {len(s_rows)} != {len(o_rows)}")
            n_fail += 1
            continue
        bad = None
        for sr, orow in zip(s_rows, o_rows):
            if not all(approx_eq(a, b) for a, b in zip(sr, orow)):
                bad = (sr, orow)
                break
        if bad:
            print(f"FAIL {name}: first row mismatch\n  spark:  {bad[0]}\n  oracle: {bad[1]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(s_rows)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
