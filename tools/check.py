#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]

Reads <verifyOutDir>/oracle_sql.json, runs each oracle in DuckDB with
views named after the parquet tables in <sfDir>, loads the Spark result
parquet from <verifyOutDir>/<name>/, and compares values with columns
sorted by name (mirroring the driver's hash compare).
"""
import json, sys, glob, math
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def canon(v):
    if isinstance(v, float):
        return v  # exact compare; report diffs below
    return v

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        try:
            oracle = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        got = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchdf()
        # driver sorts columns by name before hashing
        o = oracle[sorted(oracle.columns)]
        g = got[sorted(got.columns)]
        if list(o.columns) != list(g.columns):
            print(f"FAIL {name}: columns oracle={list(o.columns)} got={list(g.columns)}")
            n_fail += 1
            continue
        if len(o) != len(g):
            print(f"FAIL {name}: rows oracle={len(o)} got={len(g)}")
            n_fail += 1
            continue
        bad = []
        for col in o.columns:
            ov, gv = o[col].tolist(), g[col].tolist()
            for i, (a, b) in enumerate(zip(ov, gv)):
                if a is None and b is None:
                    continue
                if isinstance(a, float) and isinstance(b, float):
                    if math.isnan(a) and math.isnan(b):
                        continue
                    if a != b:
                        bad.append((col, i, a, b, abs(a-b)))
                elif str(a) != str(b):
                    bad.append((col, i, a, b, None))
        if bad:
            print(f"FAIL {name}: {len(bad)} value mismatches; first 5:")
            for col, i, a, b, d in bad[:5]:
                print(f"  [{col}][{i}] oracle={a!r} got={b!r} absdiff={d}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(o)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
