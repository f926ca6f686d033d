#!/usr/bin/env python3
"""Common-op calibration between two bench captures.

Usage: python3 tools/host_calibration.py <older.json> <newer.json>

The convention (VERDICT r12, "What's wrong" 4): cross-round or
cross-host comparisons are made on the COMMON-OP RATIO — the sum and
median of per-op new/old ratios over ops present in both captures —
never on an ad-hoc single divisor. This script IS the methodology any
calibration figure cited in a commit message must come from.

Tooling only — never shipped in the library.
"""
import json
import statistics
import sys


def main(old_path: str, new_path: str) -> int:
    old, new = (json.load(open(p)) for p in (old_path, new_path))
    qo, qn = old["queries"], new["queries"]
    common = sorted(k for k in set(qo) & set(qn)
                    if not k.startswith("stage:") and qo[k] > 0)
    if not common:
        print("no common ops")
        return 1
    ratios = {k: qn[k] / qo[k] for k in common}
    so, sn = sum(qo[k] for k in common), sum(qn[k] for k in common)
    med = statistics.median(ratios.values())
    print(f"common ops: {len(common)}")
    print(f"sum ratio   (new/old): {so:.1f}s -> {sn:.1f}s = {sn / so:.3f}")
    print(f"median per-op ratio  : {med:.3f}")
    movers = sorted(ratios.items(), key=lambda kv: -kv[1])[:8]
    print("top movers (new/old):")
    for k, r in movers:
        print(f"  {k}: {qo[k]:.2f} -> {qn[k]:.2f} ({r:.2f}x)")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
