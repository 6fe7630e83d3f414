#!/usr/bin/env python3
"""Host-paging health probe (see Bench.pagingProbe / the verify skill).

Touches a 300 MB buffer, idles 20 s (long enough for an overcommitted
hypervisor host to page the idle guest memory out), then page-stride
rescans it and prints the cold/warm time ratio. ~1 = healthy; >5 = the
host is paging and NO timing measurement taken now is trustworthy.
"""
import time

MB = 1024 * 1024
buf = bytearray(300 * MB)
for i in range(0, len(buf), 4096):
    buf[i] = 1

def scan() -> float:
    t0 = time.time()
    s = 0
    for i in range(0, len(buf), 4096):
        s += buf[i]
    return time.time() - t0

scan()
warm = min(scan() for _ in range(3))
time.sleep(20)
cold = scan()
print(f"{max(1.0, cold / max(warm, 1e-9)):.2f}")
