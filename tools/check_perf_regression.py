#!/usr/bin/env python
"""Hold-the-line perf guard: compare a bench.py record against the floors.

The headline numbers (BASELINE.md "Headline re-stamp") are attributed
floors — every lever behind them carries a measured probe — so any future
change that regresses them should fail loudly instead of silently eroding.
Run after `python bench.py > rec.json`:

    python tools/check_perf_regression.py rec.json         # or pipe stdin

Exits 0 when the record holds the floors within `--slack` (default 4 %,
covering tunnel/timing noise: repeated r3/r4 runs varied <1.5 %), 1 on a
regression, with a per-metric report either way. Floors are the r4-stamped
TPU numbers; CPU records are skipped (the guard is a TPU contract).
"""

from __future__ import annotations

import argparse
import json
import sys

# r4-stamped floors (BASELINE.md "Headline re-stamp"); direction encodes
# whether bigger or smaller is better.
FLOORS = {
    "value": (1270.0, "max"),             # frames/s/chip inference
    "train_step_s": (0.372, "min"),       # s/step full train step
    "train_step_light_s": (0.319, "min"),
    "train_mfu_pct": (49.0, "max"),
}


def check(rec: dict, slack: float) -> int:
    if rec.get("metric") != "multiview_inference_throughput":
        # zoo (--model) / regression (--reg-model) rows have no floors —
        # they are BASELINE.md anchors, not hold-the-line contracts
        print(f"non-headline record ({rec.get('metric')}): guard skipped")
        return 0
    if rec.get("unit") != "frames/sec/chip":
        print(f"unrecognized record: {rec}", file=sys.stderr)
        return 1
    # keyed on the explicit platform field (bench.py emits it since r5);
    # pre-r5 records lack it — fall back to the MFU heuristic for those
    platform = rec.get("platform")
    if platform == "cpu" or (platform is None and "train_mfu_pct" not in rec):
        print("CPU record: guard skipped — the floors are a TPU contract")
        return 0
    if rec.get("stall_retries"):
        print(f"note: {rec['stall_retries']} stalled sample(s)/retries "
              "during measurement (best-of-N absorbed them)")
    failures = []
    for key, (floor, direction) in FLOORS.items():
        if key not in rec:
            failures.append(f"{key}: MISSING from record (floor {floor})")
            continue
        got = float(rec[key])
        if direction == "max":
            ok = got >= floor * (1.0 - slack)
            rel = got / floor - 1.0
        else:
            ok = got <= floor * (1.0 + slack)
            rel = floor / got - 1.0
        status = "ok" if ok else "REGRESSION"
        print(f"{key}: {got} vs floor {floor} ({rel:+.1%}) {status}")
        if not ok:
            failures.append(f"{key}: {got} vs floor {floor}")
    if failures:
        print("PERF REGRESSION:\n  " + "\n  ".join(failures),
              file=sys.stderr)
        return 1
    print("perf line held")
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("record", nargs="?", default="-",
                    help="bench.py JSON output file (default: stdin)")
    ap.add_argument("--slack", type=float, default=0.04,
                    help="fractional tolerance before a miss counts as a "
                         "regression")
    args = ap.parse_args(argv)
    text = (sys.stdin.read() if args.record == "-"
            else open(args.record).read())
    # bench.py's contract is ONE JSON line; tolerate surrounding noise
    for line in text.splitlines():
        line = line.strip()
        if line.startswith("{"):
            return check(json.loads(line), args.slack)
    print(f"no JSON record found in input", file=sys.stderr)
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
