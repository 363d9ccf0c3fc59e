"""Round-over-round bench trend: read every BENCH_r*.json and print a
per-query table (medians, sf0.1) plus the stable-subset total — the
comparable number across rounds (new headline queries join the table
as columns appear).

Run: python tools/bench_trend.py
"""

from __future__ import annotations

import glob
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    rounds = []
    for f in sorted(glob.glob(os.path.join(ROOT, "BENCH_r*.json"))):
        r = int(f.rsplit("_r", 1)[1].split(".")[0])
        with open(f) as fh:
            d = json.load(fh)
        # driver wraps the bench's JSON line under "parsed"
        rounds.append((r, d.get("parsed", d)))
    if not rounds:
        print("no BENCH files", file=sys.stderr)
        return
    all_q = []
    for _, d in rounds:
        for q in d.get("queries", {}):
            if q not in all_q:
                all_q.append(q)
    # stable subset = queries present in EVERY round
    stable = [
        q for q in all_q
        if all(q in d.get("queries", {}) for _, d in rounds)
    ]
    hdr = ["query"] + [f"r{r}" for r, _ in rounds]
    widths = [max(len(q) for q in all_q + ["stable subset total"])] + [
        7 for _ in rounds
    ]

    def row(cells):
        return "  ".join(
            str(c).ljust(w) if i == 0 else str(c).rjust(w)
            for i, (c, w) in enumerate(zip(cells, widths))
        )

    print(row(hdr))
    for q in all_q:
        cells = [q]
        for _, d in rounds:
            v = d.get("queries", {}).get(q)
            cells.append(f"{v:.2f}" if v is not None else "-")
        print(row(cells))
    totals = ["stable subset total"]
    for _, d in rounds:
        totals.append(
            f"{sum(d['queries'][q] for q in stable):.2f}"
        )
    print(row(totals))
    ctx = ["(load1 at run)"]
    for _, d in rounds:
        ctx.append(str(d.get("load1", "-")))
    print(row(ctx))


if __name__ == "__main__":
    main()
