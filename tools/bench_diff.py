#!/usr/bin/env python3
"""Per-query ratio diff of two Bench JSON artifacts.

Usage: bench_diff.py OLD.json NEW.json [--threshold 1.5]

Reads the {"metric":"total","queries":{name:sec,...}} line each artifact
holds (BENCH_FULL.json / BENCH_r*.json; a git ref works via
`git show <ref>:BENCH_FULL.json > /tmp/old.json`), prints one row per
query sorted by regression (new/old descending), and flags rows past the
threshold. Queries present in only one artifact are listed separately so
surface growth is visible, not silently dropped.

LOAD ADJUDICATION: artifacts carry `canary_s` — the median wall time of
a constant-cost computation Bench times after warm-up, which moves only
with machine load, never with the SF or the plans. When the two
artifacts' canaries differ by more than --canary-slack (default 2x),
per-query flags are NOT comparable plan-to-plan (one run was starved for
CPU): the diff still prints, but regressions are reported as
LOAD-SKEWED and the exit code stays 0 so a loaded-box artifact can't
fail a gate the way round-10's 94s-vs-75s confusion did. Artifacts
predating the canary field diff exactly as before.
"""
import argparse
import json
import signal
import sys

signal.signal(signal.SIGPIPE, signal.SIG_DFL)  # play nice with `| head`


def load(path):
    with open(path) as f:
        text = f.read()
    # artifacts are one JSON object, possibly surrounded by log lines
    for line in text.splitlines():
        line = line.strip()
        if line.startswith("{"):
            obj = json.loads(line)
            if "queries" in obj:
                return obj
    raise SystemExit(f"{path}: no line with a 'queries' object")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=1.5,
                    help="flag ratios above this (and below 1/this)")
    ap.add_argument("--canary-slack", type=float, default=2.0,
                    help="max canary_s ratio before declaring the diff "
                         "load-skewed (flags become advisory, exit 0)")
    args = ap.parse_args()

    old, new = load(args.old), load(args.new)
    oq, nq = old["queries"], new["queries"]

    # each artifact may carry an opening AND a closing canary
    # (canary_s / canary_end_s): a load spike that starts mid-run skews
    # the closing one, so BOTH pairs gate comparability. Compared
    # against None, not truthiness — a recorded 0.0 canary is data
    # (round-11 advisor), not absence.
    load_skewed = False
    any_canary = False
    for field, tag in (("canary_s", "open"), ("canary_end_s", "close")):
        c_old, c_new = old.get(field), new.get(field)
        if c_old is not None and c_new is not None:
            any_canary = True
            if c_old > 0 and c_new > 0:
                c_ratio = max(c_new / c_old, c_old / c_new)
                skew = c_ratio > args.canary_slack
                load_skewed = load_skewed or skew
                print(f"canary[{tag}]: {c_old:.3f}s -> {c_new:.3f}s "
                      f"(x{c_ratio:.2f}"
                      f"{' — LOAD-SKEWED, flags advisory' if skew else ''})")
            else:
                print(f"canary[{tag}]: {c_old:.3f}s -> {c_new:.3f}s "
                      f"(zero canary — unusable, flags assume comparable load)")
    # a WITHIN-artifact open-vs-close drift also marks that artifact as
    # recorded under shifting load
    for side, art in (("old", old), ("new", new)):
        c0, c1 = art.get("canary_s"), art.get("canary_end_s")
        if c0 is not None and c1 is not None and c0 > 0 and c1 > 0:
            d_ratio = max(c1 / c0, c0 / c1)
            if d_ratio > args.canary_slack:
                load_skewed = True
                print(f"canary[{side}]: open {c0:.3f}s vs close {c1:.3f}s "
                      f"(x{d_ratio:.2f} WITHIN one run — LOAD-SKEWED, "
                      f"flags advisory)")
    if not any_canary and (old.get("canary_s") is not None
                           or new.get("canary_s") is not None):
        print("canary: present in only one artifact (pre-canary baseline); "
              "flags assume comparable load")
    heap_old, heap_new = old.get("heap_gb"), new.get("heap_gb")
    if heap_old is not None and heap_new is not None and heap_old != heap_new:
        print(f"heap_gb: {heap_old} -> {heap_new} — MISMATCHED HEAP CONFIGS; "
              f"driver-GC-sensitive queries (iterative rounds) are not "
              f"comparable (PLANS.md heap adjudication), flags advisory")
        load_skewed = True

    def ratio(q):
        # old == 0 carries no timing information (a sub-ms or unrecorded
        # run); such rows are reported as n/a and never count as
        # regressions rather than flagging as an infinite ratio
        return nq[q] / oq[q] if oq[q] > 0 else None

    shared = sorted(set(oq) & set(nq),
                    key=lambda q: (ratio(q) is not None, ratio(q) or 0.0),
                    reverse=True)
    only_old = sorted(set(oq) - set(nq))
    only_new = sorted(set(nq) - set(oq))

    print(f"{'query':<28} {'old_s':>8} {'new_s':>8} {'ratio':>7}  flag")
    for q in shared:
        r = ratio(q)
        if r is None:
            print(f"{q:<28} {oq[q]:>8.3f} {nq[q]:>8.3f} {'n/a':>7}  ")
            continue
        flag = ""
        if r >= args.threshold:
            flag = "REGRESSION"
        elif r <= 1 / args.threshold:
            flag = "improved"
        print(f"{q:<28} {oq[q]:>8.3f} {nq[q]:>8.3f} {r:>7.2f}  {flag}")

    tot_old = sum(oq[q] for q in shared)
    tot_new = sum(nq[q] for q in shared)
    tot_ratio = f"{tot_new / tot_old:.2f}" if tot_old > 0 else "n/a"
    print(f"\nshared {len(shared)} queries: {tot_old:.1f}s -> {tot_new:.1f}s "
          f"(ratio {tot_ratio})")
    if only_old:
        print(f"removed ({len(only_old)}): {', '.join(only_old)}")
    if only_new:
        tot = sum(nq[q] for q in only_new)
        print(f"added ({len(only_new)}, {tot:.1f}s): {', '.join(only_new)}")
    n_reg = sum(1 for q in shared
                if ratio(q) is not None and ratio(q) >= args.threshold)
    if load_skewed and n_reg:
        print(f"regressions past {args.threshold}x: {n_reg} "
              f"(LOAD-SKEWED canaries — not adjudicated as plan "
              f"regressions; rerun on an idle box)")
        return 0
    print(f"regressions past {args.threshold}x: {n_reg}")
    return 1 if n_reg else 0


if __name__ == "__main__":
    sys.exit(main())
