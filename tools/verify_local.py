#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run graft.Verify at a
given SF, then execute each oracle_sql.json query in DuckDB over the same
parquet tables and compare (sorted columns, sorted rows, exact values).

Usage: python3 tools/verify_local.py [sfDir] [outDir]
"""
import json, math, sys
import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))

def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return repr(v)

def rows_of(rel):
    cols = rel.columns
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    data = rel.fetchall()
    rows = sorted(tuple(canon(r[i]) for i in order) for r in data)
    return [cols[i] for i in order], rows

fails = 0
for name, sql in sorted(oracle.items()):
    try:
        spark_rel = con.sql(f"SELECT * FROM '{OUT}/{name}/*.parquet'")
        scols, srows = rows_of(spark_rel)
        duck_rel = con.sql(sql)
        dcols, drows = rows_of(duck_rel)
        if scols != dcols:
            print(f"FAIL {name}: columns differ spark={scols} duck={dcols}")
            fails += 1
        elif srows != drows:
            n = len([1 for a, b in zip(srows, drows) if a != b]) + abs(len(srows) - len(drows))
            print(f"FAIL {name}: rows differ (spark={len(srows)} duck={len(drows)}, ~{n} mismatched)")
            for a, b in list(zip(srows, drows))[:200]:
                if a != b:
                    print(f"  spark: {a}\n  duck : {b}")
                    break
            fails += 1
        else:
            print(f"OK   {name}: {len(srows)} rows")
    except Exception as e:
        print(f"ERROR {name}: {e}")
        fails += 1

# rows-only queries (no oracle)
import os
for d in sorted(os.listdir(OUT)):
    p = os.path.join(OUT, d)
    if os.path.isdir(p) and d not in oracle:
        try:
            n = con.sql(f"SELECT count(*) FROM '{p}/*.parquet'").fetchone()[0]
            print(f"ROWS {d}: {n} rows {'OK' if n > 0 else 'EMPTY!'}")
            if n == 0:
                fails += 1
        except Exception as e:
            print(f"ERROR {d}: {e}")
            fails += 1

print(f"\n{'ALL GREEN' if fails == 0 else f'{fails} FAILURES'}")
sys.exit(1 if fails else 0)
