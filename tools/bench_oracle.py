#!/usr/bin/env python3
"""DuckDB-side benchmark of the oracle SQL — the BASELINE.md comparator.

Usage: bench_oracle.py <sfDir> <verifyOutDir>

Mirrors graft.Bench methodology: one warmup run per query, then two
measured runs, min per query; single JSON line on stdout.
"""
import json, sys, time
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def run_once(sql):
    t0 = time.perf_counter()
    try:
        con.execute(sql).fetchall()
    except Exception:
        return None
    return time.perf_counter() - t0

results, failed = {}, []
for name, sql in sorted(oracle.items()):
    run_once(sql)  # warmup
    runs = [r for r in (run_once(sql), run_once(sql)) if r is not None]
    if runs:
        results[name] = min(runs)
    else:
        failed.append(name)

print(json.dumps({"metric": "total", "value": sum(results.values()),
                  "unit": "sec", "queries": results, "failed": failed,
                  "sf": sfdir}))
