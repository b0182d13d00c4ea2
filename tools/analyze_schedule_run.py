"""Post-run analysis of a full-schedule metrics.jsonl: per-phase step
rates (between upsample milestones), stage-boundary eval PSNRs, and the
wall decomposition — the numbers PERF.md's coarse-to-fine A/B table
reports (VERDICT r4 items 1/2/4).

Usage: python tools/analyze_schedule_run.py /tmp/fullsched_r4/log
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("logdir")
    p.add_argument("--milestones", type=int, nargs="*",
                   default=(1500, 3000, 4500, 6500))
    args = p.parse_args(argv)

    recs = []
    for root, _, files in os.walk(args.logdir):
        for fn in files:
            if fn != "metrics.jsonl":
                continue
            with open(os.path.join(root, fn)) as f:
                for line in f:
                    try:
                        recs.append(json.loads(line))
                    except ValueError:
                        pass
    steps = sorted(
        (r["step"], r["t"]) for r in recs if "step" in r and "psnr" in r
    )
    evals = sorted(
        (r["step"], round(r["eval_psnr"], 2)) for r in recs
        if "eval_psnr" in r
    )
    if not steps:
        print(json.dumps({"error": "no step records"}))
        return 1

    bounds = [0, *args.milestones, steps[-1][0] + 1]
    seg_rates = {}
    for lo, hi in zip(bounds, bounds[1:]):
        seg = [(s, t) for s, t in steps if lo < s <= hi]
        if len(seg) < 2:
            continue
        ds = seg[-1][0] - seg[0][0]
        dt = seg[-1][1] - seg[0][1]
        # stage boundaries inside a segment inflate dt with expansion /
        # eval wall; report the MEDIAN inter-record rate too (50-step
        # scalars => robust to boundary pauses)
        gaps = [
            (b[1] - a[1]) / (b[0] - a[0])
            for a, b in zip(seg, seg[1:]) if b[0] > a[0]
        ]
        gaps.sort()
        seg_rates[f"{lo + 1}-{hi}"] = {
            "steps": ds,
            "gross_s_per_step": round(dt / ds, 3),
            "median_s_per_step": round(gaps[len(gaps) // 2], 3),
        }

    out = {
        "total_steps": steps[-1][0],
        "wall_min": round((steps[-1][1] - steps[0][1]) / 60.0, 1),
        "seg_rates": seg_rates,
        "stage_boundary_eval_psnr": evals,
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
