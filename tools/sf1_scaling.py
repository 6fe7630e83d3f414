#!/usr/bin/env python3
"""Scaling analysis of a full-surface sf1 bench LOG against the
committed sf0.1 baseline (builder-side dev tool).

Parses per-attempt times from the bench stderr log (the artifact's min
can be a watchdog-capped LOWER BOUND at sf1 — every >10 s query trips
the absolute suspect ceiling, burns its budget on bounded retries, and
the final capped attempt can undercut the honest completed min). An
attempt directly preceded by a "cancelled at N s cap" line for the same
query is excluded; the reported sf1 time is the MIN OVER COMPLETED
attempts.

Usage: python3 tools/sf1_scaling.py /tmp/bench_sf1.log [top_n]
"""
import json
import re
import sys


def main(log_path, top_n=20):
    cancelled_next = set()
    times = {}          # name -> [completed attempt seconds]
    failed = {}
    for line in open(log_path, errors="replace"):
        m = re.match(r"\[bench\] (\S+) cancelled at", line)
        if m:
            cancelled_next.add(m.group(1))
            continue
        m = re.match(r"\[bench\] (\S+) FAILED", line)
        if m:
            failed[m.group(1)] = failed.get(m.group(1), 0) + 1
            # a non-watchdog failure still emits a paired timing line
            # (possibly a fast 0.2 s exception) — exclude it from the
            # min-over-completed, like cancelled attempts (r17 ADVICE)
            cancelled_next.add(m.group(1))
            continue
        m = re.match(r"\[bench\] (\S+)\s+([0-9.]+) s  gc=", line)
        if m:
            name, dt = m.group(1), float(m.group(2))
            if name in cancelled_next:
                cancelled_next.discard(name)
                continue
            times.setdefault(name, []).append(dt)

    base = json.load(open("BENCH_BASELINE.json"))["queries"]
    rows = []
    for name, ts in times.items():
        b = base.get(name)
        if not b:
            continue
        rows.append((name, min(ts), b, min(ts) / b))
    rows.sort(key=lambda r: -r[1])
    print(f"{len(times)} queries with completed sf1 attempts; "
          f"failed: {sorted(failed)}")
    print(f"sum of sf1 mins (completed) = {sum(min(t) for t in times.values()):.1f} s "
          f"vs sf0.1 committed common-set = "
          f"{sum(base[n] for n in times if n in base):.1f} s")
    print(f"\ntop {top_n} heaviest at sf1 (sf1_s / sf0.1_s / ratio for 10x data):")
    for name, t, b, r in rows[:top_n]:
        print(f"  {name:34s} {t:7.2f} / {b:6.2f} / {r:5.1f}x")
    sup = [(n, t, b, r) for n, t, b, r in rows if r > 11.0]
    print(f"\nsuperlinear (>11x for 10x data): "
          f"{[(n, round(r,1)) for n, t, b, r in sup] or 'none'}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 20))
