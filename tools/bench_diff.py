"""Diff two bench_all JSONL captures and flag regressions.

Usage: python tools/bench_diff.py bench_all_r03.jsonl bench_all_r04.jsonl
       [--threshold 0.2]

Each input is the stdout of ``python bench.py --all`` (one JSON object per
line, ``{"metric": ..., "value": ..., "unit": ...}``). Prints a table of
metric deltas and exits 1 when any shared higher-is-better metric regressed
by more than the threshold (VERDICT r3 weak 3: make per-subsystem numbers
machine-auditable and regressions diffable).

Regression judgement prefers the profiler-derived DEVICE-truth fields
(``kernel_device_realtime_x`` / ``device_only_realtime_x``) when both
captures carry them: on this environment the e2e columns swing 2-3x with
the shared vCPU and remote-TPU tunnel (CLAUDE.md trap 4) while the
device-busy numbers reproduce to <1%.
"""

from __future__ import annotations

import json
import sys

# lower-is-better units: a value INCREASE is the regression
_LOWER_BETTER = ("ms", "seconds", "s_per_call")


def load(path: str) -> dict:
    out = {}
    with open(path) as fh:
        for line in fh:
            line = line.strip()
            if not line or not line.startswith("{"):
                continue
            try:
                d = json.loads(line)
            except json.JSONDecodeError:
                continue
            if "metric" in d and isinstance(d.get("value"), (int, float)):
                out[d["metric"]] = d
    return out


def main(argv) -> int:
    thr = 0.2
    if "--threshold" in argv:
        i = argv.index("--threshold")
        thr = float(argv[i + 1])
        del argv[i: i + 2]
    old, new = load(argv[0]), load(argv[1])
    shared = sorted(set(old) & set(new))
    regressions = []

    def dev(d):
        return d.get("kernel_device_realtime_x") or d.get(
            "device_only_realtime_x")

    for m in shared:
        a, b = old[m]["value"], new[m]["value"]
        if a == 0:
            continue
        unit = str(new[m].get("unit", ""))
        lower_better = any(u in unit for u in _LOWER_BETTER)
        change = (b - a) / abs(a)
        da, db = dev(old[m]), dev(new[m])
        if da and db:  # device truth wins: e2e is tunnel/host noise here
            judged = (db - da) / abs(da)
            lower_better = False
            suffix = f"  [device {da:,.0f} -> {db:,.0f} {judged:+.1%}]"
        else:
            judged = change
            suffix = ""
        bad = judged > thr if lower_better else judged < -thr
        tag = "REGRESSED" if bad else ("improved" if
                                       (judged < 0) == lower_better and
                                       abs(judged) > thr else "")
        print(f"{m:55s} {a:>14,.1f} -> {b:>14,.1f}  {change:+7.1%}  "
              f"{tag}{suffix}")
        if bad:
            regressions.append(m)
    for m in sorted(set(new) - set(old)):
        print(f"{m:55s} {'new':>14s} -> {new[m]['value']:>14,.1f}")
    for m in sorted(set(old) - set(new)):
        print(f"{m:55s} {old[m]['value']:>14,.1f} -> {'gone':>14s}")
    if regressions:
        print(f"\n{len(regressions)} metric(s) regressed > {thr:.0%}: "
              + ", ".join(regressions))
        return 1
    print(f"\nno regressions > {thr:.0%} across {len(shared)} shared metrics")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
