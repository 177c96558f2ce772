#!/usr/bin/env python
"""Session-long host-epoch sampler.

The fast-epoch scaling hunt (bench/hunt_scaling.py with a finite
max_epoch_factor gate) only fires when the hypervisor epoch drops near the
all-time spin floor. When a hunt ends empty, the honest evidence that no
fast window EXISTED (vs. the hunter missing one) is a continuous log of the
epoch factor over the whole hunt. This sampler appends one record every
``interval_s`` seconds to BENCH/epoch_log_r05.jsonl:

    {"ts": ..., "spin_ms": ..., "epoch_factor": ..., "loadavg1": ...}

Cost: one median-of-3 single-thread spin (~0.15 s) per sample — invisible
to concurrent 2/8-core scaling legs.

Usage: python bench/epoch_log.py [duration_s] [interval_s]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import run_scaling as rs  # noqa: E402

LOG = os.path.join(rs.REPO, "BENCH", "epoch_log_r05.jsonl")


def sample(floor: float) -> dict:
    spin = sorted(rs.spin_ms() for _ in range(3))[1]
    with open("/proc/loadavg") as fh:
        load1 = float(fh.read().split()[0])
    return {
        "ts": round(time.time(), 1),
        "spin_ms": round(spin, 2),
        "epoch_factor": round(spin / floor, 2),
        "loadavg1": load1,
    }


def main() -> None:
    duration_s = int(sys.argv[1]) if len(sys.argv) > 1 else 18000
    interval_s = int(sys.argv[2]) if len(sys.argv) > 2 else 120
    # anchor to the PERSISTED floor, never a fresh spin: a floorless host
    # would otherwise report epoch_factor ~1.0 no matter how slow it runs,
    # which defeats the log's purpose (evidence that a fast window existed)
    import noise
    floor = noise.read_spin_floor(rs.REPO)
    if floor is None:
        sys.exit("epoch_log: no persisted spin floor (BENCH/spin_floor.json) — "
                 "run bench.py once to establish it; refusing to log "
                 "current-epoch-anchored factors")
    deadline = time.time() + duration_s
    while time.time() < deadline:
        rec = sample(floor)
        with open(LOG, "a") as fh:
            fh.write(json.dumps(rec) + "\n")
        time.sleep(interval_s)


if __name__ == "__main__":
    main()
