#!/usr/bin/env python
"""Render the before/after bench table for OPTIMIZATION_r13.md from two
bench JSON-line logs (same host, paired)."""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict:
    line = [l for l in open(path) if l.startswith('{"metric"')][-1]
    return json.loads(line)


def main() -> None:
    before, after = load(sys.argv[1]), load(sys.argv[2])
    b, a = before["queries"], after["queries"]
    rows = sorted(b, key=lambda k: -b[k])
    out = [
        "| key | before s | after s | ratio |",
        "|---|---|---|---|",
    ]
    for k in rows:
        if k not in a:
            continue
        r = b[k] / a[k] if a[k] else float("inf")
        out.append(f"| {k} | {b[k]:.3f} | {a[k]:.3f} | {r:.2f}x |")
    out.append(
        f"| **TOTAL** | **{before['value']:.2f}** | **{after['value']:.2f}** |"
        f" **{before['value'] / after['value']:.2f}x** |"
    )
    out.append(
        f"\nloadavg before-run start/end: {before['host']['loadavg_start']} /"
        f" {before['host']['loadavg_end']}; after-run:"
        f" {after['host']['loadavg_start']} / {after['host']['loadavg_end']}"
    )
    print("\n".join(out))


if __name__ == "__main__":
    main()
