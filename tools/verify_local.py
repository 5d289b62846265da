#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate (dev tool only — the
shipped Scala library has no Python dependency).

Usage:  python3 tools/verify_local.py /root/testdata/sf0.01 /tmp/verify_out

Expects `sbt "runMain graft.Verify <sfDir> <outDir>"` to have populated
<outDir> with one parquet dir per query plus oracle_sql.json. Runs each
oracle SQL in DuckDB over the same tables and compares value-exactly after
sorting columns by name and rows by all values — i.e. stricter than any
plausible driver hash."""
import sys, json, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def canon(df):
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)

def cmp_cell(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) or isinstance(b, float):
        if a is None or b is None:
            return False
        # engine type mismatch (e.g. float vs str) must report FAIL, not
        # crash the verifier with TypeError from math.isnan
        if not (isinstance(a, float) and isinstance(b, float)):
            return a == b
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b

def types_of(con, sql):
    """DuckDB column_name -> column_type for a query (order-insensitive)."""
    d = con.sql(f"DESCRIBE {sql}").df()
    return dict(zip(d["column_name"], d["column_type"]))

def main():
    sf, out = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        try:
            # The driver's hash is TYPE-sensitive (HUGEINT != BIGINT even when
            # values match byte-for-byte — cost 4 queries in round 2). Compare
            # DuckDB's typing of the oracle against the written parquet schema
            # before comparing values; pandas canon below coerces types away.
            texp = types_of(con, f"({oracle[name]})")
            tgot = types_of(con, f"SELECT * FROM '{out}/{name}/*.parquet'")
            if texp != tgot:
                diffs = {k: (texp.get(k), tgot.get(k))
                         for k in set(texp) | set(tgot) if texp.get(k) != tgot.get(k)}
                print(f"FAIL {name}: result types differ (oracle, spark): {diffs}")
                n_fail += 1
                continue
            exp = canon(con.sql(oracle[name]).df())
            got = canon(con.sql(f"SELECT * FROM '{out}/{name}/*.parquet'").df())
        except Exception as e:
            print(f"FAIL {name}: {str(e)[:200]}")
            n_fail += 1
            continue
        if list(exp.columns) != list(got.columns):
            print(f"FAIL {name}: columns exp={list(exp.columns)} got={list(got.columns)}")
            n_fail += 1
            continue
        if len(exp) != len(got):
            print(f"FAIL {name}: rows exp={len(exp)} got={len(got)}")
            n_fail += 1
            continue
        bad = None
        ev, gv = exp.values, got.values
        for i in range(len(exp)):
            for j in range(len(exp.columns)):
                if not cmp_cell(ev[i][j], gv[i][j]):
                    bad = (i, exp.columns[j], ev[i][j], gv[i][j])
                    break
            if bad:
                break
        if bad:
            print(f"FAIL {name}: row {bad[0]} col {bad[1]} exp={bad[2]!r} got={bad[3]!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(exp)} rows x {len(exp.columns)} cols)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
