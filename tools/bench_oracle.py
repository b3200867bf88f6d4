#!/usr/bin/env python3
"""Time each oracle SQL in DuckDB at a given SF — the executable-proxy
baseline the judge compares BENCH_rN.json against. Writes one JSON file
(default ORACLE_BENCH.json in the repo root) with min-of-2 wall seconds
per query, so the Spark-vs-DuckDB ratio survives the round instead of
living in /tmp.

Usage: python3 tools/bench_oracle.py [sfDir] [oracleJson] [outJson]
  sfDir      parquet table dir           (default /root/testdata/sf0.1)
  oracleJson oracle_sql.json from a graft.Verify dump
             (default /tmp/graft_verify/oracle_sql.json)
  outJson    output path                 (default ORACLE_BENCH.json)

Notes: DuckDB gets the same 32 threads local[32] gives Spark. Queries are
fully materialized (fetchall) — the same "pay for every operator" rule
graft.Bench.force applies to the Spark side. Contract-style oracles
(closed-form SQL that doesn't re-run the computation, e.g.
q_winnow_align's 6 ms constant or q_cluster_keep_one's recursive CTE) are
timed too but are NOT valid proxies — the judge's exclusion list applies
when reading ratios.
"""
import json
import sys
import time

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
ORACLE = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify/oracle_sql.json"
OUT = sys.argv[3] if len(sys.argv) > 3 else "ORACLE_BENCH.json"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
con.sql("SET threads TO 32")
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

oracle = json.load(open(ORACLE))

def time_once(sql):
    t0 = time.monotonic()
    con.sql(sql).fetchall()
    return time.monotonic() - t0

results, errors = {}, {}
for name, sql in sorted(oracle.items()):
    try:
        results[name] = round(min(time_once(sql), time_once(sql)), 4)
    except Exception as e:  # noqa: BLE001 — record and keep timing the rest
        errors[name] = str(e).split("\n")[0][:200]

payload = {
    "engine": "duckdb",
    "threads": 32,
    "sf_dir": SF,
    "protocol": "min-of-2, fully materialized",
    "total_sec": round(sum(results.values()), 3),
    "queries": results,
}
if errors:
    payload["errors"] = errors
with open(OUT, "w") as f:
    json.dump(payload, f, indent=1, sort_keys=True)
print(f"{len(results)} oracle queries timed, {len(errors)} errors -> {OUT}")
