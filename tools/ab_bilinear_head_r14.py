"""Interleaved ABBA A/B: q_bilinear_irregular at HEAD vs the r14-close
checkout (fe3d5e3) — VERDICT r16 item 1, the one open perf question.

r14 recorded cpu median 16.1 s for this query; the r16 driver run read
cpu_best 32.0 s, but every observation rode a box whose load was
climbing DURING the run (PERF.md + session memory: the host degrades
under sustained load, so sequential runs are not comparable). This
harness settles it: each arm runs in its own CHILD process (so each
checkout's code loads fresh), arms alternate A/B/B/A per pair, and the
verdict is the per-pair cpu ratio — the host trend moves both arms of
a pair together, the ratio isolates the code.

Verdict rule (from the VERDICT): paired median cpu ratio <= 1.15 →
host theory confirmed, the weak flag clears; otherwise a real plan
regression exists and must be root-caused.

Run: python tools/ab_bilinear_head_r14.py [sf_dir] [pairs] [timed_reps]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
R14 = os.path.join(REPO, ".worktrees", "r14")
QUERY = "q_bilinear_irregular"


def run_arm(checkout: str, sf_dir: str, timed_reps: int) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "ab_checkout_rep.py"),
         checkout, QUERY, sf_dir, str(timed_reps)],
        capture_output=True, text=True, check=True,
    ).stdout.strip().splitlines()[-1]
    return json.loads(out)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    timed_reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    if not os.path.isdir(R14):
        sys.exit(f"missing r14 worktree at {R14}: "
                 "git worktree add .worktrees/r14 fe3d5e3")

    results = []
    for p in range(pairs):
        # ABBA: even pairs run A-first, odd pairs B-first, so neither
        # arm systematically occupies the cooler first slot
        order = ("head", "r14") if p % 2 == 0 else ("r14", "head")
        pair = {}
        for arm in order:
            checkout = REPO if arm == "head" else R14
            r = run_arm(checkout, sf_dir, timed_reps)
            pair[arm] = r
            print(f"pair {p} {arm}: cpu={r['cpu']} wall={r['wall']} "
                  f"shuf={r['shuffle_write_records']} "
                  f"load1={r['start_load1']}", flush=True)
        results.append(pair)

    ratios = []
    for pair in results:
        a = min(pair["head"]["cpu"])
        b = min(pair["r14"]["cpu"])
        ratios.append(a / b)
    head_shuf = {s for pair in results
                 for s in pair["head"]["shuffle_write_records"]}
    r14_shuf = {s for pair in results
                for s in pair["r14"]["shuffle_write_records"]}
    med = statistics.median(ratios)
    summary = {
        "query": QUERY, "sf_dir": sf_dir, "pairs": pairs,
        "paired_cpu_ratios_head_over_r14": [round(r, 3) for r in ratios],
        "paired_median_cpu_ratio": round(med, 3),
        "head_cpu_min": round(min(min(p["head"]["cpu"]) for p in results), 3),
        "r14_cpu_min": round(min(min(p["r14"]["cpu"]) for p in results), 3),
        "head_shuffle_records": sorted(head_shuf),
        "r14_shuffle_records": sorted(r14_shuf),
        "verdict": ("HOST (ratio <= 1.15: plans cost the same — the "
                    "observed drift was box degradation)"
                    if med <= 1.15 else
                    "REGRESSION (HEAD plan costs more than r14 on the "
                    "same box at the same moment — root-cause it)"),
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
