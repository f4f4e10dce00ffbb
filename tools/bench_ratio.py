#!/usr/bin/env python3
"""Per-query scaling table from two graft.Bench JSON lines.

Usage: bench_ratio.py <bench_small.json> <bench_big.json> [factor]

Prints a markdown table of per-query seconds at both scales and the
ratio big/small; `factor` (default 10) is the data-scale multiple, so
ratio < factor = sub-linear, ratio ~ factor = linear, > factor flagged.
"""
import json, sys

def load(p):
    with open(p) as f:
        txt = f.read()
    start = txt.index('{"metric"')
    return json.loads(txt[start:txt.index("\n", start) if "\n" in txt[start:] else len(txt)])

def main(small_path, big_path, factor=10.0):
    s, b = load(small_path), load(big_path)
    sq, bq = s["queries"], b["queries"]
    rows = []
    for q in sorted(sq):
        if q not in bq:
            continue
        ts, tb = sq[q], bq[q]
        ratio = tb / ts if ts > 0 else float("inf")
        rows.append((q, ts, tb, ratio))
    rows.sort(key=lambda r: -r[3])
    print(f"| query | {s['sf'].split('/')[-1]} s | {b['sf'].split('/')[-1]} s | ratio (x{factor:.0f} data) |")
    print("|---|---|---|---|")
    flagged = 0
    for q, ts, tb, ratio in rows:
        mark = " **>linear**" if ratio > factor * 1.15 and tb > 1.0 else ""
        if mark:
            flagged += 1
        print(f"| {q} | {ts:.2f} | {tb:.2f} | {ratio:.1f}{mark} |")
    print(f"\ntotal: {s['value']:.1f} s -> {b['value']:.1f} s "
          f"(x{b['value']/s['value']:.1f} wall for x{factor:.0f} data); "
          f"{flagged} queries above linear (and >1 s)")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], float(sys.argv[3]) if len(sys.argv) > 3 else 10.0)
