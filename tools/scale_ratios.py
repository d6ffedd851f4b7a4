#!/usr/bin/env python3
"""Scale-curve analysis between two bench_full.json artifacts.

Usage: scale_ratios.py <low.json> <high.json> [factor] [threshold]

Prints per-query ratios high/low for queries with low >= 0.3 s (the
same floor the round-12 sf1 table used), the quartiles over that set,
and every query whose ratio exceeds `threshold` (default 4.0) sorted
worst-first — the list BASELINE.md names causes for. Queries present
in only one artifact (skipped on one side) are listed separately so a
chunked sitting is self-describing.
"""
import json
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    return d


def main(lo_path, hi_path, factor=10.0, threshold=4.0):
    lo, hi = load(lo_path), load(hi_path)
    qlo, qhi = lo["queries"], hi["queries"]
    # a query's best available steady number: solo min beats suite median
    slo, shi = lo.get("solo", {}), hi.get("solo", {})

    def steady(qmap, smap, name):
        v = smap.get(name)
        return v if v and v > 0 else qmap.get(name)

    shared = sorted(set(qlo) & set(qhi))
    only_lo = sorted(set(qlo) - set(qhi))
    only_hi = sorted(set(qhi) - set(qlo))
    rows = []
    for n in shared:
        a, b = steady(qlo, slo, n), steady(qhi, shi, n)
        if a is None or b is None or a <= 0 or b <= 0:
            continue
        rows.append((n, a, b, b / a))
    eligible = [r for r in rows if r[1] >= 0.3]
    ratios = sorted(r[3] for r in eligible)

    def q(p):
        i = max(0, min(len(ratios) - 1, int(p * (len(ratios) - 1))))
        return ratios[i]

    print(f"shared={len(shared)} eligible(lo>=0.3s)={len(eligible)} "
          f"factor={factor}x")
    if ratios:
        print(f"ratio quartiles (p25/p50/p75): "
              f"{q(0.25):.2f} / {q(0.50):.2f} / {q(0.75):.2f}   "
              f"p90={q(0.90):.2f} max={ratios[-1]:.2f}")
    tot_lo = sum(r[1] for r in rows)
    tot_hi = sum(r[2] for r in rows)
    print(f"sum lo={tot_lo:.1f}s hi={tot_hi:.1f}s "
          f"(board ratio {tot_hi / tot_lo:.2f}x at {factor}x data)")
    bad = sorted((r for r in eligible if r[3] > threshold),
                 key=lambda r: -r[3])
    print(f"\nqueries over {threshold}x ({len(bad)}):")
    for n, a, b, r in bad:
        print(f"  {n:45s} {a:8.2f} -> {b:9.2f}  {r:6.2f}x")
    if only_lo:
        print(f"\nonly in {lo_path} ({len(only_lo)}): "
              + ", ".join(only_lo))
    if only_hi:
        print(f"only in {hi_path} ({len(only_hi)}): "
              + ", ".join(only_hi))
    for side, d in (("lo", lo), ("hi", hi)):
        sk = d.get("skipped") or []
        fl = d.get("failed") or {}
        if sk:
            print(f"{side} skipped: {', '.join(sk)}")
        if fl:
            print(f"{side} FAILED: {', '.join(fl)}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2],
         float(sys.argv[3]) if len(sys.argv) > 3 else 10.0,
         float(sys.argv[4]) if len(sys.argv) > 4 else 4.0)
