#!/usr/bin/env python3
"""Dev-only harness mirroring the driver's DuckDB-oracle compare.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

For each query: read the Spark parquet result, run the oracle SQL in
DuckDB against the same parquet tables, sort columns by name and rows by
value, and compare exactly (with a small float tolerance fallback so we
can distinguish "bit mismatch" from "real bug").
NOT part of the shipped library (driver-side python only).
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    return v


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = 0
    for name, sql in sorted(oracle.items()):
        try:
            spark_rel = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            spark_cols = [c[0] for c in spark_rel.description]
            spark_rows = spark_rel.fetchall()
            duck_rel = con.execute(sql)
            duck_cols = [c[0] for c in duck_rel.description]
            duck_rows = duck_rel.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: exec error: {e}")
            continue
        if sorted(spark_cols) != sorted(duck_cols):
            print(f"FAIL  {name}: schema {sorted(spark_cols)} vs {sorted(duck_cols)}")
            continue
        # The driver's hash is type-sensitive (round 2: DuckDB sum(int) ->
        # HUGEINT hashed != Spark BIGINT despite equal values). Flag any
        # column whose DuckDB result type differs from the Spark parquet
        # type so the artifact can't hide behind Python int equality.
        s_types = {c[0]: c[1] for c in spark_rel.description}
        d_types = {c[0]: c[1] for c in duck_rel.description}
        ty_bad = [c for c in s_types
                  if s_types[c] != d_types.get(c)]
        if ty_bad:
            # a type mismatch IS a failure: the driver hash is
            # type-sensitive, so equal Python values with different
            # engine types would still hash-mismatch in the gate
            print(f"FAIL  {name}: type " + ", ".join(
                f"{c}: spark={s_types[c]} duck={d_types[c]}" for c in ty_bad))
            continue
        s_ix = [spark_cols.index(c) for c in sorted(spark_cols)]
        d_ix = [duck_cols.index(c) for c in sorted(duck_cols)]
        s = sorted([tuple(norm(r[i]) for i in s_ix) for r in spark_rows],
                   key=lambda t: tuple((x is None, str(type(x)), x) for x in t))
        d = sorted([tuple(norm(r[i]) for i in d_ix) for r in duck_rows],
                   key=lambda t: tuple((x is None, str(type(x)), x) for x in t))
        if len(s) != len(d):
            print(f"FAIL  {name}: rows {len(s)} vs {len(d)}")
            continue
        if s == d:
            print(f"PASS  {name} ({len(s)} rows, exact)")
            n_pass += 1
            continue
        # locate first mismatch, check if within tolerance
        bad = None
        tol_ok = True
        for i, (a, b) in enumerate(zip(s, d)):
            if a != b:
                for x, y in zip(a, b):
                    if x != y:
                        if isinstance(x, float) and isinstance(y, float):
                            if abs(x - y) > 1e-6 * max(1, abs(x), abs(y)):
                                tol_ok = False
                        else:
                            tol_ok = False
                if bad is None:
                    bad = (i, a, b)
        tag = "TOL " if tol_ok else "FAIL"
        print(f"{tag}  {name}: first diff row {bad[0]}:")
        print(f"      spark: {bad[1]}")
        print(f"      duck : {bad[2]}")
    print(f"== {n_pass}/{len(oracle)} exact ==")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
