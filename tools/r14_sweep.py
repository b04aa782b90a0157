#!/usr/bin/env python3
"""DuckDB half of the round-14 two-sided scale sweep: runs the committed
oracle SQL for q137/q182/q107/q135 against the K-replicated parquet dirs
R14Sweep wrote (warmup + min-of-2, fetchall action — the
bench_oracle.py / q81q43_sweep.py methodology).

Usage: r14_sweep.py <verifyOutDir-with-oracle_sql.json> [K...]
"""
import json
import sys
import time

import duckdb

QUERIES = [
    "q137_ppl_buckets",
    "q182_train_quality_lr",
    "q107_vocab_encode",
    "q135_bpe_fertility",
]

outdir = sys.argv[1]
ks = [int(k) for k in sys.argv[2:]] or [1, 4, 16, 64]
oracle = json.load(open(f"{outdir}/oracle_sql.json"))

print("| K | docs | " + " | ".join(f"duckdb {q} s" for q in QUERIES) + " |")
print("|---|---|" + "|".join("---" for _ in QUERIES) + "|")
for k in ks:
    con = duckdb.connect()
    # Out-of-core spill + explicit cap: without a temp_directory DuckDB
    # cannot spill and the K=64 q137 oracle dies with a bare OOM; with
    # it, whatever still cannot complete is recorded as an honest OOM
    # cell instead of killing the sweep.
    con.execute("PRAGMA temp_directory='/tmp/duckdb_spill'")
    con.execute("PRAGMA memory_limit='100GB'")
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('/tmp/graftsweep/k{k}/documents.parquet/*.parquet')"
    )

    def run_once(sql):
        t0 = time.perf_counter()
        con.execute(sql).fetchall()
        return time.perf_counter() - t0

    times = {}
    for name in QUERIES:
        sql = oracle[name]
        try:
            run_once(sql)  # warmup
            times[name] = f"{min(run_once(sql), run_once(sql)):.2f}"
        except duckdb.OutOfMemoryException:
            times[name] = "OOM"
    print(
        f"| {k} | {5000 * k} | "
        + " | ".join(times[q] for q in QUERIES)
        + " |"
    )
    con.close()
