#!/usr/bin/env python3
"""Local pre-validation of SparkEntry.oracleSql vs Verify output.

Mimics the driver's compare: for each query, read the Spark result
parquet and run the oracle SQL in DuckDB over the same sf tables, then
compare schemas (column names sorted) and values row by row.

Usage: python3 tools/check_oracles.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, math
import duckdb
import pyarrow.parquet as pq
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def canon(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v  # full precision — the driver hashes exact values
    if isinstance(v, bool):
        return bool(v)
    return str(v) if not isinstance(v, (int,)) else v


def dtype_class(dt):
    s = str(dt)
    if s.startswith("int") or s.startswith("uint"):
        return "int"
    if s.startswith("float"):
        return "float"
    if s == "bool":
        return "bool"
    if s.startswith("datetime"):
        return "datetime"
    return "object"


def dtype_report(name, sdf, ddf):
    """The driver's hash is dtype-CLASS-sensitive (empirically, round 1):
    int32 vs int64 and datetime64[ns] vs [us] hash equal, but DuckDB
    HUGEINT sums surfacing as float64 against Spark int64 hash-mismatch.
    Also array/list cells break the driver's pandas sort_values."""
    import datetime as _dt
    probs = []
    for c in sorted(sdf.columns):
        sc, dc = dtype_class(sdf[c].dtype), dtype_class(ddf[c].dtype)
        # date32 parquet cells surface as datetime.date objects but the
        # driver's read path normalizes them to datetimes (q14 passed r1)
        if sc == "object" and len(sdf) and isinstance(sdf[c].iloc[0], _dt.date):
            sc = "datetime"
        # same normalization for DuckDB: a DATE column can surface from
        # .df() as datetime.date objects too
        if dc == "object" and len(ddf) and isinstance(ddf[c].iloc[0], _dt.date):
            dc = "datetime"
        if sc != dc:
            probs.append(f"dtype class {c}: spark={sdf[c].dtype} duck={ddf[c].dtype}")
        if sc == "object" and len(sdf) and isinstance(sdf[c].iloc[0], (np.ndarray, list, dict)):
            probs.append(f"unsortable cell type in {c}: {type(sdf[c].iloc[0]).__name__}")
    return probs

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            files = glob.glob(f"{out_dir}/{name}/*.parquet")
            if not files:
                print(f"FAIL {name}: no spark output")
                n_fail += 1
                continue
            spark_tbl = pq.read_table(files[0])
            cols = sorted(spark_tbl.column_names)
            spark_rows = [tuple(canon(row[c]) for c in cols)
                          for row in spark_tbl.to_pylist()]
            duck = con.sql(sql)
            dcols = sorted(duck.columns)
            idx = [duck.columns.index(c) for c in dcols]
            duck_rows = [tuple(canon(r[i]) for i in idx) for r in duck.fetchall()]
            if cols != dcols:
                print(f"FAIL {name}: columns spark={cols} duck={dcols}")
                n_fail += 1
                continue
            probs = dtype_report(name, spark_tbl.to_pandas(), con.sql(sql).df())
            if probs:
                print(f"FAIL {name}: " + "; ".join(probs))
                n_fail += 1
                continue
            if spark_rows == duck_rows:
                print(f"PASS {name} ({len(spark_rows)} rows)")
                n_pass += 1
            else:
                n_fail += 1
                print(f"FAIL {name}: rows spark={len(spark_rows)} duck={len(duck_rows)}")
                for i, (a, b) in enumerate(zip(spark_rows, duck_rows)):
                    if a != b:
                        print(f"  first diff at row {i}:\n    spark={a}\n    duck ={b}")
                        break
                else:
                    k = min(len(spark_rows), len(duck_rows))
                    print(f"  length mismatch after {k} equal rows;"
                          f" spark extra={spark_rows[k:k+2]} duck extra={duck_rows[k:k+2]}")
        except Exception as e:
            n_fail += 1
            print(f"FAIL {name}: oracle error: {str(e)[:300]}")
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
