#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle correctness gate.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<query>/ parquet result, runs the matching oracle
SQL from <verifyOutDir>/oracle_sql.json against the sfDir tables in DuckDB,
and compares row count, column names (sorted), and values.
"""
import sys, json, glob, os
import duckdb

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        res_glob = os.path.join(out_dir, name, "*.parquet")
        if not glob.glob(res_glob):
            print(f"FAIL {name}: no spark result written")
            n_fail += 1
            continue
        try:
            spark_df = con.execute(f"SELECT * FROM read_parquet('{res_glob}')").fetchdf()
            duck_df = con.execute(sql).fetchdf()
            s_types = {r[0]: r[1] for r in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{res_glob}')").fetchall()}
            d_types = {r[0]: r[1] for r in con.execute(f"DESCRIBE {sql}").fetchall()}
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        s_cols, d_cols = sorted(spark_df.columns), sorted(duck_df.columns)
        if s_cols != d_cols:
            print(f"FAIL {name}: columns spark={s_cols} duck={d_cols}")
            n_fail += 1
            continue
        # The driver's hash is type-aware: a value-identical result with a
        # different output type (e.g. DuckDB promoting window SUM(BIGINT) to
        # HUGEINT) still fails the gate. Catch that class of bug locally.
        type_skew = [f"{c}: spark={s_types[c]} duck={d_types[c]}"
                     for c in s_cols if s_types.get(c) != d_types.get(c)]
        if type_skew:
            print(f"FAIL {name}: output type skew [{'; '.join(type_skew)}]")
            n_fail += 1
            continue
        a, b = spark_df[s_cols], duck_df[d_cols]
        if len(a) != len(b):
            print(f"FAIL {name}: rows spark={len(a)} duck={len(b)}")
            n_fail += 1
            continue
        mismatch = None
        for c in s_cols:
            av, bv = list(a[c]), list(b[c])
            for i, (x, y) in enumerate(zip(av, bv)):
                xn = x != x if isinstance(x, float) else x is None
                yn = y != y if isinstance(y, float) else y is None
                if xn and yn:
                    continue
                if x != y:
                    mismatch = f"col {c} row {i}: spark={x!r} duck={y!r}"
                    break
            if mismatch:
                break
        if mismatch:
            print(f"FAIL {name}: {mismatch}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(a)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
