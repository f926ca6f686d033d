#!/usr/bin/env python3
"""Scaling-slope report: compare two Bench JSON lines (base scale vs
N-fold synthesized scale) and flag super-linear operators.

Usage: python3 tools/scaling_report.py <base.json> <scaled.json> <factor>

An op is flagged when t_scaled / t_base > factor * SLACK (slack covers
fixed overhead noise on sub-second ops and machine jitter). Ops under
MIN_BASE seconds at base scale are reported but never flagged — their
time is dominated by per-query constant overhead, not data.
"""
import json
import sys

SLACK = 1.5
MIN_BASE = 0.5


def main(base_path: str, scaled_path: str, factor: float) -> int:
    base_doc = json.load(open(base_path))
    scaled_doc = json.load(open(scaled_path))
    base = dict(base_doc["queries"])
    scaled = dict(scaled_doc["queries"])
    # staged-artifact build costs (post-r7 Bench separates them from
    # per-op numbers) get their own slope rows — the index builds are
    # exactly the scale-sensitive part of the dedup/ANN families
    for k, v in base_doc.get("staging", {}).items():
        base[f"stage:{k}"] = v
    for k, v in scaled_doc.get("staging", {}).items():
        scaled[f"stage:{k}"] = v
    rows = []
    for name in sorted(base):
        b, s = base.get(name, -1), scaled.get(name, -1)
        if b is None or s is None or b < 0 or s < 0:
            rows.append((name, b, s, None, "ERROR"))
            continue
        ratio = s / b if b > 0 else float("inf")
        flag = "SUPER-LINEAR" if (b >= MIN_BASE and ratio > factor * SLACK) else ""
        rows.append((name, b, s, ratio, flag))
    print(f"| op | t(base) s | t({factor:g}x) s | ratio | verdict |")
    print("| --- | --- | --- | --- | --- |")
    for name, b, s, ratio, flag in rows:
        r = f"{ratio:.1f}x" if ratio is not None else "—"
        v = flag or ("~const" if ratio is not None and ratio < 2 else "≤linear" if not flag else flag)
        print(f"| {name} | {b:.2f} | {s:.2f} | {r} | {v} |")
    tb = sum(b for _, b, s, r, f in rows if b and b > 0)
    ts = sum(s for _, b, s, r, f in rows if s and s > 0)
    print(f"\ntotal: {tb:.1f}s -> {ts:.1f}s ({ts/tb:.1f}x at {factor:g}x data)")
    flagged = [n for n, b, s, r, f in rows if f == "SUPER-LINEAR"]
    print("flagged super-linear:", flagged or "none")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], float(sys.argv[3])))
