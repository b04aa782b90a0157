#!/usr/bin/env python3
"""Per-round perf-regression guard (round-12 item: make "zero
regressions" machine-checked instead of judge-recomputed).

Usage: bench_regression.py <prev_bench_local.json> <curr_bench_local.json>
           [--no-narrow] [--oracle-prev X.json] [--oracle-curr Y.json]
           [--sentinels q1,q2,...]

Diffs two committed same-session Spark bench artifacts and prints a
MUST-DISPOSITION list: every query present in BOTH whose Spark time
grew by MORE than 1.5x AND more than +0.3 s (both thresholds — the
ratio alone flags noise on sub-100ms queries, the delta alone flags
noise on multi-second ones; a real regression moves both).

Disposition pipeline (round-16: the round-15 tool stamped its first
real flag `confirmed_regression` where the evidence said HOST DRIFT —
a fresh-JVM re-measure detects "not a composed-run fluke" but cannot
distinguish a slower host from a slower plan; this version normalizes
for host speed BEFORE confirming):

1. `host_drift` — the flagged query's ORACLE (DuckDB) time drifted the
   same way in the same sessions. DuckDB's code is byte-identical
   between rounds, so its drift on the SAME query measures the host,
   not the plan. With h = max(1, oracle_curr/oracle_prev for the
   query; fallback: median oracle drift over the shared surface), a
   flag whose host-normalized time curr/h is back within band is the
   host, not a regression. Oracle artifacts are auto-discovered from
   the bench filenames (bench_rNN_local.json -> bench_oracle_rNN.json)
   or passed with --oracle-prev/--oracle-curr. Checked FIRST: it is
   deterministic from committed artifacts and needs no re-run.
2. `self_dispositioned_variance` — the narrowed fresh-JVM re-measure
   (one `graft.Bench <flagged...>` pass, the measurement class that
   settled q79) lands back within band vs prev: the flag was
   composed-run context, not a regression.
3. `host_drift_narrowed` — still out of band in the fresh JVM, but the
   SENTINEL queries re-timed in the SAME narrowed pass (pinned,
   code-unchanged queries; default a diverse slow-stable trio,
   override with --sentinels) drifted by the same factor: the
   narrow-time host is slow. h_narrow = median(narrowed/prev over
   sentinels, excluding the flagged query itself); in-band at
   narrowed/h_narrow => host. Note the flagged query's narrowed time
   comes from the SAME pass as the sentinels', so dividing by h_narrow
   cancels shared narrowed-pass context (cold JVM, un-amortized
   warm-up) along with host speed — that sharing is why the sentinel
   ratio is a valid normalizer rather than a conflation; a real
   regression still surfaces because its plan-level slowdown is NOT
   shared with the sentinels.
4. `confirmed_regression` — out of band after every normalizer.

The narrowed pass runs with SPARK_GRAFT_LOAD_WAIT_MAX=0 (no co-load
wait — the wait would silently eat this script's own 3600 s subprocess
timeout; a co-loaded narrow run self-documents via the artifact's
load fields instead).

The full disposition record (flags + the normalization inputs used)
is written to `<curr>.regression.json`. `--no-narrow` skips the
re-measurement (pure diff + host-drift mode).

Exit 1 if any CONFIRMED flag remains, 0 otherwise, so the end-of-round
rhythm can gate on it. New/removed queries are listed informationally,
never flagged. NOTE: a narrowed run is for DISPOSITIONING variance
flags only (is the query still slow in a fresh JVM?) — never judge an
optimization by one (3-query batches swing ±40%; use an in-JVM A/B).
"""
import json
import os
import re
import statistics
import subprocess
import sys

# Pinned host-speed sentinels for the narrowed pass: stable, mid-weight,
# rarely-touched queries spanning three unrelated code paths (exact
# dedup hash-agg, banded LSH join, projection ANN). If a round DOES
# touch one, pass --sentinels with replacements — a touched sentinel
# measures the change, not the host.
DEFAULT_SENTINELS = ["q20_dedup_exact", "q24_minhash_lsh",
                     "q127_random_projection"]


def load(path):
    with open(path) as f:
        d = json.load(f)
    q = d.get("queries", d)
    return d, {k: float(v) for k, v in q.items()
               if isinstance(v, (int, float))}


def oracle_path_for(bench_path):
    """bench_rNN_local.json -> bench_oracle_rNN.json beside it."""
    m = re.search(r"bench_(r\d+)_local\.json$", os.path.basename(bench_path))
    if not m:
        return None
    p = os.path.join(os.path.dirname(bench_path) or ".",
                     f"bench_oracle_{m.group(1)}.json")
    return p if os.path.exists(p) else None


def narrowed_pass(names, sf_dir):
    """One fresh-JVM graft.Bench run over exactly the flagged queries
    (plus sentinels); returns its per-query seconds map ({} on any
    failure — the caller records narrow_failed rather than dying)."""
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir,
               SPARK_GRAFT_LOAD_WAIT_MAX="0")
    cmd = ["sbt", "-batch", "runMain graft.Bench " + " ".join(sorted(names))]
    print(f"\nnarrowed fresh-JVM triage: {' '.join(cmd)} (sf={sf_dir})")
    try:
        out = subprocess.run(cmd, capture_output=True, text=True, env=env,
                             timeout=3600)
    except (subprocess.TimeoutExpired, OSError) as e:
        print(f"  narrowed pass failed: {e}")
        return {}
    for line in out.stdout.splitlines():
        s = line.strip()
        if s.startswith("[info] "):
            s = s[len("[info] "):]
        if s.startswith("{") and '"metric"' in s:
            try:
                return json.loads(s).get("queries", {})
            except json.JSONDecodeError:
                pass
    print("  narrowed pass produced no parseable bench line "
          f"(rc={out.returncode})")
    return {}


def arg_value(argv, flag):
    if flag in argv:
        i = argv.index(flag)
        v = argv[i + 1]
        del argv[i:i + 2]
        return v
    return None


def main():
    argv = sys.argv[1:]
    do_narrow = "--no-narrow" not in argv
    oprev_path = arg_value(argv, "--oracle-prev")
    ocurr_path = arg_value(argv, "--oracle-curr")
    sentinels = (arg_value(argv, "--sentinels") or
                 ",".join(DEFAULT_SENTINELS)).split(",")
    args = [a for a in argv if a != "--no-narrow"]
    if len(args) != 2:
        print(__doc__)
        return 2
    _, prev = load(args[0])
    curr_doc, curr = load(args[1])
    shared = sorted(set(prev) & set(curr))
    added = sorted(set(curr) - set(prev))
    removed = sorted(set(prev) - set(curr))

    def out_of_band(p, c):
        return c > p * 1.5 and c > p + 0.3

    flagged = [(q, prev[q], curr[q]) for q in shared
               if out_of_band(prev[q], curr[q])]
    improved = sum(1 for q in shared
                   if curr[q] < prev[q] and (q, prev[q], curr[q]) not in flagged)
    print(f"shared={len(shared)} added={len(added)} removed={len(removed)} "
          f"improved={improved} flagged={len(flagged)}")
    if added:
        print(f"  new queries (not gated): {', '.join(added)}")
    if removed:
        print(f"  removed queries: {', '.join(removed)}")
    if not flagged:
        # The zero-flag state is itself a round artifact (the judge
        # reads <curr>.regression.json): record it machine-readably
        # instead of leaving last round's file as the newest one.
        with open(args[1] + ".regression.json", "w") as f:
            json.dump({"rule": "grew >1.5x AND >+0.3s on the shared "
                               "surface => must-disposition",
                       "prev": args[0], "curr": args[1],
                       "shared": len(shared), "improved": improved,
                       "added": sorted(added), "removed": sorted(removed),
                       "flags": []}, f, indent=1)
        print("no regressions on the shared surface")
        return 0

    print("\nMUST-DISPOSITION (grew >1.5x AND >+0.3s):")
    for q, p, c in flagged:
        print(f"  {q}: {p:.3f}s -> {c:.3f}s "
              f"({c / p:.2f}x, +{c - p:.3f}s)")

    # Stage 1: same-session oracle-drift host normalization. DuckDB ran
    # the same code in both sessions, so per-query oracle drift is a
    # host-speed measurement taken AT the flagged measurements.
    oprev = ocurr = {}
    op = oprev_path or oracle_path_for(args[0])
    oc = ocurr_path or oracle_path_for(args[1])
    if op and oc:
        _, oprev = load(op)
        _, ocurr = load(oc)
        print(f"\noracle artifacts for host normalization: {op}, {oc}")
    else:
        print("\nno oracle artifacts found (pass --oracle-prev/--oracle-curr)"
              " — skipping host-drift stage")
    oshared = set(oprev) & set(ocurr)
    omedian = (statistics.median(ocurr[k] / oprev[k] for k in oshared)
               if oshared else None)

    # Own-oracle drift is only meaningful when the oracle runs long
    # enough that its ratio isn't timer noise: a 4ms -> 11ms wobble
    # would yield h=2.75 and silently excuse a multi-second Spark
    # regression. Below the floor, the MEDIAN drift over the whole
    # shared surface (~190 queries) is the robust host signal.
    ORACLE_NOISE_FLOOR_S = 0.1

    def host_factor(q):
        """Never below 1: a FASTER oracle never excuses a slower plan."""
        if (q in oprev and q in ocurr
                and oprev[q] >= ORACLE_NOISE_FLOOR_S
                and ocurr[q] >= ORACLE_NOISE_FLOOR_S):
            return max(1.0, ocurr[q] / oprev[q]), "own_oracle_drift"
        if omedian is not None:
            return max(1.0, omedian), "median_oracle_drift"
        return 1.0, "none"

    records, confirmed, survivors = [], [], []
    for q, p, c in flagged:
        h, hsrc = host_factor(q)
        if h > 1.0 and not out_of_band(p, c / h):
            records.append({"query": q, "prev_s": p, "curr_s": c,
                            "narrowed_s": None, "host_factor": round(h, 4),
                            "host_factor_source": hsrc,
                            "disposition": "host_drift"})
        else:
            survivors.append((q, p, c, h, hsrc))

    # Stage 2+3: narrowed fresh-JVM re-measure, with sentinels riding
    # along to measure the NARROW-TIME host.
    narrowed = {}
    if do_narrow and survivors:
        sf_dir = curr_doc.get("sf", "/root/testdata/sf0.1")
        sent = [s for s in sentinels if s in prev]
        narrowed = narrowed_pass(
            sorted({q for q, *_ in survivors} | set(sent)), sf_dir)
    for q, p, c, h, hsrc in survivors:
        n = narrowed.get(q)
        sent_ratios = [narrowed[s] / prev[s] for s in sentinels
                       if s != q and s in narrowed and s in prev
                       and prev[s] > 0]
        h_narrow = (max(1.0, statistics.median(sent_ratios))
                    if sent_ratios else 1.0)
        if n is None:
            disp = "narrow_failed" if do_narrow else "not_narrowed"
        elif not out_of_band(p, n):
            disp = "self_dispositioned_variance"
        elif h_narrow > 1.0 and not out_of_band(p, n / h_narrow):
            disp = "host_drift_narrowed"
        else:
            disp = "confirmed_regression"
        if disp not in ("self_dispositioned_variance", "host_drift_narrowed"):
            confirmed.append(q)
        records.append({"query": q, "prev_s": p, "curr_s": c,
                        "narrowed_s": n, "host_factor": round(h, 4),
                        "host_factor_source": hsrc,
                        "narrow_host_factor": round(h_narrow, 4),
                        "disposition": disp})

    report = args[1] + ".regression.json"
    with open(report, "w") as f:
        json.dump({
            "rule": ("host_drift: own-oracle drift h>=1 puts curr/h back "
                     "in band (<=1.5x or <=+0.3s vs prev) — own-oracle "
                     "only when BOTH oracle times >= 0.1s (below that the "
                     "ratio is timer noise; fall back to the median drift "
                     "over the whole shared surface); else narrowed "
                     "fresh-JVM re-measure in band => variance; else in "
                     "band after dividing by median sentinel drift "
                     "measured in the SAME narrowed pass (the flagged "
                     "query shares that pass's JVM/warm-up context, so "
                     "the division cancels context as well as host "
                     "speed) => host_drift_narrowed; else confirmed. "
                     "DuckDB code is identical across rounds, so its "
                     "drift on the same query/session measures the host, "
                     "not the plan."),
            "sentinels": sentinels,
            "oracle_prev": op, "oracle_curr": oc,
            "median_oracle_drift": omedian,
            "flags": records}, f, indent=1)
    print(f"\ndispositions -> {report}")
    for r in records:
        ns = "-" if r["narrowed_s"] is None else f"{r['narrowed_s']:.3f}s"
        print(f"  {r['query']}: host_factor={r['host_factor']} "
              f"({r['host_factor_source']}) narrowed={ns} "
              f"-> {r['disposition']}")
    if confirmed:
        print(f"\nCONFIRMED regressions (out of band after host "
              f"normalization and fresh-JVM re-measure): "
              f"{', '.join(confirmed)}")
        return 1
    print("\nall flags dispositioned (host drift / variance)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
