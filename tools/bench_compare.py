#!/usr/bin/env python3
"""Compare two full bench artifacts (the one-line JSON graft.Bench writes
to bench_out.json / benchhist/bench_rN_full.json): per-query median deltas,
biggest regressions/wins, totals. Local tooling only.

Usage: python3 tools/bench_compare.py <old.json> <new.json> [topN]
"""
import sys, json

def load(p):
    return json.loads(open(p).read())

def main(old_p, new_p, top=12):
    old, new = load(old_p), load(new_p)
    oq, nq = old["queries"], new["queries"]
    common = sorted(set(oq) & set(nq))
    only_new = sorted(set(nq) - set(oq))
    only_old = sorted(set(oq) - set(nq))
    deltas = [(nq[k] - oq[k], nq[k], oq[k], k) for k in common]
    print(f"old total {old['value']}s ({len(oq)} queries)  "
          f"new total {new['value']}s ({len(nq)} queries)")
    print(f"common {len(common)}; new-only {only_new}; dropped {only_old}")
    print(f"sum over common: old {sum(oq[k] for k in common):.1f}s "
          f"new {sum(nq[k] for k in common):.1f}s")
    print(f"\nbiggest regressions (new - old, top {top}):")
    for d, n, o, k in sorted(deltas, reverse=True)[:top]:
        print(f"  {k:40s} {o:7.3f} -> {n:7.3f}  ({d:+.3f}s)")
    print(f"\nbiggest wins (top {top}):")
    for d, n, o, k in sorted(deltas)[:top]:
        print(f"  {k:40s} {o:7.3f} -> {n:7.3f}  ({d:+.3f}s)")
    if only_new:
        print("\nnew queries:")
        for k in only_new:
            print(f"  {k:40s} {nq[k]:7.3f}")
    degr = new.get("degraded") or []
    errs = new.get("errs") or {}
    print(f"\nnew run: degraded={degr} errs={list(errs)[:5]} "
          f"leaks={new.get('leaks')}")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]) if len(sys.argv) > 3 else 12)
