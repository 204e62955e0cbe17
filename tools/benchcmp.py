#!/usr/bin/env python3
"""Compare two BENCH_DETAIL.json files on their common query subset.

Usage: python3 tools/benchcmp.py <old_detail.json> <new_detail.json>

Prints per-query medians, the ratio, rep-stability flags (any rep >2x
its sibling reps), and the common-subset totals — the builder's A/B
evidence loop for bench attribution.
"""
import json, sys

def load(p):
    d = json.load(open(p))
    return {k: v for k, v in d["queries"].items() if v.get("median", -1) >= 0}

def main(a, b):
    qa, qb = load(a), load(b)
    common = sorted(set(qa) & set(qb))
    ta = tb = 0.0
    rows = []
    for k in common:
        ma, mb = qa[k]["median"], qb[k]["median"]
        ta += ma
        tb += mb
        reps = qb[k].get("reps", [])
        tail = bool(reps) and max(reps) > 2 * min(reps)
        flag = ""
        if mb > 1.25 * ma:
            flag += " REGRESSED"
        if tail:
            flag += f" TAIL{[round(r,2) for r in reps]}"
        if flag:
            rows.append(f"  {k}: {ma:.2f} -> {mb:.2f} ({mb/ma:.2f}x){flag}")
    print(f"common subset: {len(common)} queries")
    print(f"totals: {ta:.1f}s -> {tb:.1f}s ({tb/ta:.2f}x)")
    print("regressions >1.25x or unstable reps:")
    print("\n".join(rows) if rows else "  (none)")
    only_b = sorted(set(qb) - set(qa))
    if only_b:
        tn = sum(qb[k]["median"] for k in only_b)
        print(f"new-only queries: {len(only_b)} totalling {tn:.1f}s")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
