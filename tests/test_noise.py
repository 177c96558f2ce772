"""bench/noise.py attribution primitives — loose bounds only (the host is
multi-tenant, so assertions must hold under arbitrary external load)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench"))
import noise  # noqa: E402


def test_window_monitor_attributes_own_busy_loop():
    with noise.WindowMonitor() as mon:
        t0 = time.perf_counter()
        x = 0
        while time.perf_counter() - t0 < 1.2:
            x += sum(range(1000))
    # our single busy python thread must show up as ~1 core of "ours"
    assert 0.4 <= mon.ours_cores <= 2.5, mon.ours_cores
    assert mon.busy_cores >= mon.ours_cores * 0.5
    assert 0.0 <= mon.steal_pct <= 100.0
    assert mon.tenant_cores >= 0.0


def test_window_monitor_idle_window():
    with noise.WindowMonitor() as mon:
        time.sleep(1.0)
    # sleeping: our own tree contributes (near) nothing
    assert mon.ours_cores < 0.6, mon.ours_cores


def test_spin_and_clean_ratio_sane():
    s = noise.spin_ms()
    assert 1.0 < s < 10_000
    assert noise.clean_ratio(2) <= noise.clean_ratio(8) <= noise.clean_ratio(32)
