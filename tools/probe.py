#!/usr/bin/env python3
"""Host-paging probe (builder-side dev tool, mirrors graft.Bench's
in-JVM probe): allocate 256 MB, warm page-stride scan, idle, cold
re-scan; ratio ~1 = healthy host, >5 = hypervisor paging active.

Usage: python3 tools/probe.py [idle_seconds]
Prints one line: "probe <ratio>" — gate bench runs on ratio < 2.
"""
import sys, time

idle = float(sys.argv[1]) if len(sys.argv) > 1 else 8.0
buf = bytearray(256 * 1024 * 1024)
step = 4096
for i in range(0, len(buf), step):
    buf[i] = 1

def scan():
    t0 = time.perf_counter()
    s = 0
    for i in range(0, len(buf), step):
        s += buf[i]
    return time.perf_counter() - t0, s

scan()
warm = min(scan()[0] for _ in range(3))
time.sleep(idle)
cold, _ = scan()
print(f"probe {max(1.0, cold / max(warm, 1e-9)):.1f}")
