#!/usr/bin/env python3
"""Round-over-round bench comparison from two committed bench records
(r14 advice #7 / r15 verdict #8): builder and judge read the SAME numbers.

Usage: bench_diff.py <old_record.json> <new_record.json> [topN]

Prints: common-query geomean speedup, total old/new, per-family splits,
and the topN improvements/regressions. A record is the one-line JSON the
bench emits ({"metric":"total",...,"queries":{name:sec,...}}).
"""
import json
import math
import sys
from collections import defaultdict


def load(path):
    with open(path) as f:
        return json.load(f)


def main():
    old, new = load(sys.argv[1]), load(sys.argv[2])
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 15
    oq, nq = old["queries"], new["queries"]
    common = sorted(set(oq) & set(nq))
    dropped = sorted(set(oq) - set(nq))
    added = sorted(set(nq) - set(oq))
    if dropped:
        print(f"DROPPED ({len(dropped)}): {', '.join(dropped)}")
    if added:
        print(f"added ({len(added)}): {', '.join(added)}")
    ratios = {k: nq[k] / oq[k] for k in common if oq[k] > 0 and nq[k] > 0}
    geomean = math.exp(sum(math.log(r) for r in ratios.values()) / len(ratios))
    tot_o = sum(oq[k] for k in common)
    tot_n = sum(nq[k] for k in common)
    print(f"common {len(common)}  total {tot_o:.1f} -> {tot_n:.1f} s "
          f"({tot_n / tot_o:.3f}x)  geomean new/old {geomean:.3f}")
    print(f"run_totals old {old.get('run_totals')} new {new.get('run_totals')}"
          f"  (burst = max/min within one record)")
    fam_o, fam_n = defaultdict(float), defaultdict(float)
    for k in common:
        fam = k.split("_")[0]
        fam = "q*" if fam.startswith("q") and fam[1:].isdigit() else fam
        fam_o[fam] += oq[k]
        fam_n[fam] += nq[k]
    print("\nfamily        old      new    ratio")
    for fam in sorted(fam_o, key=lambda f: -fam_o[f]):
        print(f"{fam:<12} {fam_o[fam]:7.2f} {fam_n[fam]:8.2f} "
              f"{fam_n[fam] / fam_o[fam]:8.2f}")
    by_delta = sorted(common, key=lambda k: nq[k] - oq[k])
    print(f"\ntop {top_n} improved (by seconds)")
    for k in by_delta[:top_n]:
        print(f"  {k:<28} {oq[k]:7.2f} -> {nq[k]:6.2f}  ({ratios.get(k, 0):.2f}x)")
    print(f"\ntop {top_n} regressed (by seconds)")
    for k in reversed(by_delta[-top_n:]):
        print(f"  {k:<28} {oq[k]:7.2f} -> {nq[k]:6.2f}  ({ratios.get(k, 0):.2f}x)")


if __name__ == "__main__":
    main()
