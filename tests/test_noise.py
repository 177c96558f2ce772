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


def test_pair_matched_rules():
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench"))
    import run_scaling as rs

    ok_a = dict(epoch_factor=2.4, spin_post=1.0)
    ok_b = dict(epoch_factor=2.3, spin_post=1.05)
    assert rs.pair_matched(ok_a, ok_b)
    # epoch flip between legs
    assert not rs.pair_matched(ok_a, dict(epoch_factor=3.2, spin_post=1.0))
    # mid-leg epoch flip visible in the post-spin
    assert not rs.pair_matched(ok_a, dict(epoch_factor=2.35, spin_post=2.6))
    assert not rs.pair_matched(dict(epoch_factor=2.4, spin_post=0.5), ok_b)
    # legacy records without epoch fields fall back to the stored flag
    assert rs.pair_matched(dict(epoch_matched=True), dict(epoch_matched=True))
    assert not rs.pair_matched(dict(epoch_matched=True), dict())


def test_read_spin_floor_formats(tmp_path):
    """noise.read_spin_floor is THE single parser for spin_floor.json: both
    the observation-list and legacy single-value formats parse; missing /
    corrupt / non-positive files yield None (callers pick their fallback)."""
    bench_dir = tmp_path / "BENCH"
    bench_dir.mkdir()
    f = bench_dir / "spin_floor.json"
    f.write_text('{"spin_floor_ms": 20.5, "observations": [[1.0, 25.0], [2.0, 20.5]]}')
    assert noise.read_spin_floor(str(tmp_path)) == 20.5
    f.write_text('{"spin_floor_ms": 33.0}')  # legacy single-value
    assert noise.read_spin_floor(str(tmp_path)) == 33.0
    for corrupt in ('{"spin_floor_ms": 0}', "[1, 2]", "not json", "{}",
                    '{"observations": [[]]}',        # malformed entry: o[1] raises IndexError
                    '{"observations": [[1.0]]}'):    # ditto, one-element entry
        f.write_text(corrupt)
        assert noise.read_spin_floor(str(tmp_path)) is None
    f.unlink()
    assert noise.read_spin_floor(str(tmp_path)) is None
