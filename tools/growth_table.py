#!/usr/bin/env python3
"""Per-query growth table between two graft.Bench JSON artifacts.

Usage: python3 tools/growth_table.py <benchA.json> <benchB.json> [dataRatio]

Prints every query's A-vs-B wall time and growth ratio, sorted worst
first, plus per-family and total rows. <dataRatio> (e.g. 10 for
sf1 -> sf10) marks queries whose growth exceeds the data ratio —
the super-linear candidates the scaling-octave discipline hunts.

Driver-side tooling only.
"""
import json
import sys
from collections import defaultdict


def load(p):
    d = json.load(open(p))
    return d["queries"], d.get("sf", p)


def main():
    qa, sfa = load(sys.argv[1])
    qb, sfb = load(sys.argv[2])
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else None
    rows = []
    for name in sorted(qa):
        if name not in qb:
            continue
        a, b = qa[name], qb[name]
        rows.append((name, a, b, b / a if a > 0 else float("inf")))
    rows.sort(key=lambda r: -r[3])
    print(f"{'query':<28}{sfa:>9}{sfb:>9}{'growth':>9}")
    for name, a, b, g in rows:
        flag = "  <-- super-linear" if ratio and g > ratio else ""
        print(f"{name:<28}{a:>9.2f}{b:>9.2f}{g:>8.2f}x{flag}")
    fam_a, fam_b = defaultdict(float), defaultdict(float)
    for name, a, b, _ in rows:
        fam_a[name[0]] += a
        fam_b[name[0]] += b
    print()
    for f in sorted(fam_a):
        print(f"family {f:<21}{fam_a[f]:>9.2f}{fam_b[f]:>9.2f}"
              f"{fam_b[f] / fam_a[f]:>8.2f}x")
    ta, tb = sum(fam_a.values()), sum(fam_b.values())
    med = sorted(r[3] for r in rows)[len(rows) // 2]
    print(f"{'TOTAL':<28}{ta:>9.2f}{tb:>9.2f}{tb / ta:>8.2f}x"
          f"   median per-query {med:.2f}x over {len(rows)} queries")


if __name__ == "__main__":
    main()
