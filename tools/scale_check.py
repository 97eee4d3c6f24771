#!/usr/bin/env python3
"""Scale-linearity check: BENCH at a multiplied SF vs the base SF.

Usage: scale_check.py BASE.json BIG.json [--mult 10] [--slack 2.0]
                      [--floor 0.5]

For each query, the sf-scaled expectation is `mult * base_sec` — the
cost model for a data-linear operator — and a query is flagged when
its big-SF time exceeds `slack * max(floor, mult * base_sec)`. The
`floor` absorbs fixed per-query overhead (session/trigger setup,
planner work, dim-table scans) that does not grow with the fact
tables; without it every 40 ms constant-time query would be "flagged"
for not shrinking relative to 10x its own noise.

ID-PREDICATE CAVEAT (round-10 advisor): SfScale remaps every surrogate
key `k -> k*mult + copy`, which changes what id-arithmetic predicates
select at the big SF. Two families are affected:
  - modulus fixtures (`vec_id % 5`, `doc_id % 97/% 101`,
    `c_custkey % 10`, `o_orderkey % 100`): when mult shares a factor
    with the modulus, the filter selects whole copies instead of a
    per-copy stripe — same selectivity (so linearity expectations
    hold), but a different row composition than the base fixture;
  - literal id ranges (`doc_id BETWEEN 100 AND 140` in the
    corpus-edit/time-travel fixtures, `vec_id < nQueries` query
    subsets): these select ~base-scale ROW COUNTS at any mult, so the
    queries measure base-sized workloads at the big SF and their big/
    base ratio sits near the `floor`, never near `mult`. That is by
    design for the edit fixtures (an UPDATE of 41 documents is a
    41-document update at every corpus size); treat their ratios as
    fixed-cost rows, not linearity evidence.
Neither family can FALSE-FLAG (both run at or under the linear
budget), so no exclusion list is needed — this note exists so a
near-floor ratio on ns_sql_update/ns_time_travel/ns_knn_* is read as
"fixture-pinned workload", not "sub-linear operator".
"""
import argparse
import json
import signal
import sys

signal.signal(signal.SIGPIPE, signal.SIG_DFL)


def load(path):
    with open(path) as f:
        for line in f.read().splitlines():
            line = line.strip()
            if line.startswith("{"):
                obj = json.loads(line)
                if "queries" in obj:
                    return obj
    raise SystemExit(f"{path}: no line with a 'queries' object")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("base")
    ap.add_argument("big")
    ap.add_argument("--mult", type=float, default=10.0)
    ap.add_argument("--slack", type=float, default=2.0)
    ap.add_argument("--floor", type=float, default=0.5)
    args = ap.parse_args()

    base, big = load(args.base), load(args.big)
    bq, gq = base["queries"], big["queries"]
    # Bench's automatic chain-state adjudication (round-18 verdict #5):
    # any in-chain reading far above its own isolated floor was
    # re-timed in the same artifact after a full state scrub. A query
    # over the linear budget whose RE-PROBE is within it is an
    # adjudicated chain-state episode, not a scale flag.
    reprobe = big.get("reprobe_s", {})
    common = sorted(set(bq) & set(gq))
    rows = []
    adjudicated = []
    for name in common:
        b, g = bq[name], gq[name]
        if b < 0 or g < 0:
            rows.append((float("inf"), name, b, g, True))
            continue
        budget = args.slack * max(args.floor, args.mult * b)
        flag = g > budget
        if flag and 0 <= reprobe.get(name, -1) <= budget:
            adjudicated.append((name, g, reprobe[name]))
            flag = False
        rows.append((g / max(b, 1e-9), name, b, g, flag))
    rows.sort(reverse=True)
    flagged = [r for r in rows if r[4]]
    print(f"{len(common)} common queries; mult={args.mult} "
          f"slack={args.slack} floor={args.floor}s; "
          f"{len(flagged)} flagged"
          + (f"; {len(adjudicated)} chain-state (reprobed in budget)"
             if adjudicated else ""))
    for name, g, rp in adjudicated:
        print(f"  adjudicated chain-state: {name} in-chain {g:.3f}s, "
              f"scrubbed re-probe {rp:.3f}s within budget")
    print(f"{'query':34s} {'base':>8s} {'big':>8s} {'ratio':>7s}  flag")
    for ratio, name, b, g, flag in rows[:40]:
        print(f"{name:34s} {b:8.3f} {g:8.3f} {ratio:7.2f}  "
              f"{'FLAG' if flag else ''}")
    only_base = sorted(set(bq) - set(gq))
    only_big = sorted(set(gq) - set(bq))
    if only_base:
        print("only in base:", ", ".join(only_base))
    if only_big:
        print("only in big:", ", ".join(only_big))
    sys.exit(1 if flagged else 0)


if __name__ == "__main__":
    main()
