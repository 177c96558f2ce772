#!/usr/bin/env python
"""Host capability probe — the single-box-physics context for the scaling
ladders in BENCH/BASELINE.md.

Two measurements, both with PROCESS pools (threads would serialize on the
GIL and fake contention):

1. per-core compute speed vs concurrency: N simultaneous sort-spins
   (bench/noise.spin_ms) — the ratio mean(parallel)/solo captures all-core
   turbo drop + shared-L3 pressure. On this host the 4->16 ratio alone caps
   cache/bandwidth-sensitive core-scaling efficiency near 0.7, which is why
   local[4] -> local[16] on ONE box is a pessimistic stand-in for
   4 -> 16 EXECUTORS (each executor node brings its own memory system).
2. aggregate memory bandwidth vs concurrency: 64 MB ndarray copies per
   process for a fixed wall window; aggregate GB/s vs the 1-process figure
   shows how quickly one memory system saturates.

Writes BENCH/host_probe.json and prints it. Run on an idle host (the
result is the HOST's capability, not the pipeline's); the recorded loadavg
lets readers judge the window.
"""

from __future__ import annotations

import json
import os
import platform
import sys
import time
from multiprocessing import Pool

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import noise  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spin_once(_arg) -> float:
    return noise.spin_ms()


def _copy_bw(window_s: float) -> float:
    """GB/s of 64 MB buffer-to-buffer copies over ``window_s`` in THIS
    process. Both buffers are preallocated and touched first — a fresh
    ``.copy()`` per iteration would measure mmap/page-fault cost, not
    memory bandwidth."""
    import numpy as np

    src = np.full(64 << 20, 1, dtype=np.uint8)
    dst = np.zeros_like(src)
    np.copyto(dst, src)  # warm both mappings
    done = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < window_s:
        np.copyto(dst, src)
        done += src.nbytes
    return done / (time.perf_counter() - t0) / 1e9


def main() -> None:
    levels = [int(x) for x in (sys.argv[1:] or ["1", "4", "16", "32"])]
    solo = min(_spin_once(None) for _ in range(5))
    spin_ratio: dict[str, float] = {}
    for n in levels:
        with Pool(n) as pool:
            times = pool.map(_spin_once, range(n))
        spin_ratio[str(n)] = round(sum(times) / len(times) / solo, 2)

    bandwidth: dict[str, float] = {}
    for n in levels:
        if n > (os.cpu_count() or n):
            continue
        with Pool(n) as pool:
            rates = pool.map(_copy_bw, [0.5] * n)
        bandwidth[str(n)] = round(sum(rates), 2)

    out = {
        "spin_ms_solo": round(solo, 2),
        "spin_ratio_vs_solo": spin_ratio,
        "copy_bandwidth_gbs": bandwidth,
        "loadavg": os.getloadavg()[0],
        "cpu_count": os.cpu_count(),
        "host": platform.node(),
        "ts": time.time(),
    }
    # capability merge across runs (like the bench spin floor): keep the
    # BEST per level — min slowdown ratio, max bandwidth — so one probe in
    # a slow/noisy epoch cannot understate what the box can do; the last
    # raw run is kept alongside for provenance
    path = os.path.join(REPO, "BENCH", "host_probe.json")
    try:
        with open(path) as fh:
            prev = json.load(fh)
        for lvl, r in prev.get("spin_ratio_vs_solo", {}).items():
            if lvl in spin_ratio:
                spin_ratio[lvl] = min(spin_ratio[lvl], float(r))
        for lvl, b in prev.get("copy_bandwidth_gbs", {}).items():
            if lvl in bandwidth:
                bandwidth[lvl] = max(bandwidth[lvl], float(b))
    except (OSError, ValueError):
        pass
    merged = dict(out, spin_ratio_vs_solo=spin_ratio,
                  copy_bandwidth_gbs=bandwidth, last_run=out)
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(path, "w") as fh:
        json.dump(merged, fh, indent=1)
    print(json.dumps(merged))


if __name__ == "__main__":
    main()
