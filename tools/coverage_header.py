#!/usr/bin/env python3
"""Generate COVERAGE.md's headline performance sentence from the
committed per-query bench artifacts, so the header can never drift from
the numbers it cites (round-10 verdict item: the header quoted a
superseded pair).

Usage: python3 tools/coverage_header.py [spark.json] [oracle.json]
Prints the sentence to paste between the COVERAGE.md markers
`<!-- perf:generated ... -->`.
"""
import json
import re
import sys


def qnum(name: str) -> int:
    m = re.match(r"q(\d+)_", name)
    return int(m.group(1)) if m else -1


def main() -> None:
    spark_path = sys.argv[1] if len(sys.argv) > 1 else "bench_r11_local.json"
    oracle_path = sys.argv[2] if len(sys.argv) > 2 else "bench_oracle_r11.json"
    with open(spark_path) as f:
        spark = json.load(f)["queries"]
    with open(oracle_path) as f:
        oracle = json.load(f)["queries"]

    paired = sorted(set(spark) & set(oracle))
    legacy = [q for q in paired if qnum(q) <= 63]
    s_all = sum(spark[q] for q in paired)
    o_all = sum(oracle[q] for q in paired)
    s_leg = sum(spark[q] for q in legacy)
    o_leg = sum(oracle[q] for q in legacy)

    print(
        f"legacy shared surface (q1–q63, {len(legacy)} paired) "
        f"**{s_leg / o_leg:.2f}×**, "
        f"all {len(paired)} paired **{s_all / o_all:.2f}×** "
        f"(Spark {s_all:.1f} s vs DuckDB {o_all:.1f} s; "
        f"artifacts: {spark_path} / {oracle_path})"
    )


if __name__ == "__main__":
    main()
