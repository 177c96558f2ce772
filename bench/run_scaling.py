#!/usr/bin/env python
"""Run the N-vs-4N scaling pair via spark-submit --py-files sketchlib.zip
(the north-rule invocation form) and write BENCH/BASELINE.md with
throughputs + scaling efficiency.

Noise protocol: this sandbox shares its 32 cores with external tenants whose
bursts last minutes and are invisible except through stolen CPU (loadavg
6-20 with zero local processes). Every run is therefore bracketed by a
CALIBRATION SPIN — a fixed single-core NumPy sort timed against the session
minimum. A run only counts as CLEAN if the spin is quiet immediately before
launch and immediately after completion; the harness keeps sampling
(interleaved N / 4N so both levels see the same noise windows) until each
level has a clean run or the round budget is exhausted. Efficiency is
computed from best CLEAN runs; contaminated samples are listed, not used.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
import zipfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CALIB = np.random.default_rng(0).integers(0, 1 << 30, 1_500_000, dtype=np.int64)


def spin_ms() -> float:
    t0 = time.perf_counter()
    np.sort(_CALIB)
    return (time.perf_counter() - t0) * 1000.0


def make_zip() -> str:
    zpath = os.path.join(REPO, ".cache", "sketchlib.zip")
    os.makedirs(os.path.dirname(zpath), exist_ok=True)
    with zipfile.ZipFile(zpath, "w") as z:
        pkg = os.path.join(REPO, "sketchlib")
        for fn in sorted(os.listdir(pkg)):
            if fn.endswith(".py"):
                z.write(os.path.join(pkg, fn), f"sketchlib/{fn}")
    return zpath


def wait_quiet(calib_ref: float, ratio: float = 1.3, max_wait_s: int = 420) -> float:
    """Block until the calibration spin says the host is quiet (bounded)."""
    t0 = time.time()
    s = spin_ms()
    while time.time() - t0 < max_wait_s and s > ratio * calib_ref:
        time.sleep(8)
        s = spin_ms()
    return s


def run_one(master: str, zpath: str, n_docs: int, calib_ref: float) -> dict:
    pre = wait_quiet(calib_ref)
    cmd = [
        "spark-submit",
        "--master", master,
        "--py-files", zpath,
        "--driver-memory", "48g",
        os.path.join(REPO, "bench", "bench_sketch.py"),
        "--master", master,
        "--n-docs", str(n_docs),
    ]
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=3600)
    post = spin_ms()
    for line in out.stdout.splitlines():
        line = line.strip()
        if line.startswith("{") and "tokens_per_sec" in line:
            r = json.loads(line)
            r["spin_pre"] = round(pre / calib_ref, 2)
            r["spin_post"] = round(post / calib_ref, 2)
            r["clean"] = pre < 1.5 * calib_ref and post < 1.5 * calib_ref
            return r
    sys.stderr.write(out.stdout[-3000:] + "\n" + out.stderr[-3000:])
    raise RuntimeError(f"no result line from {master}")


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    n_small = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    max_rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    min_rounds = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    n_big = 4 * n_small
    zpath = make_zip()
    calib_ref = min(spin_ms() for _ in range(7))

    # interleave the two levels so both sample the same noise windows; keep
    # sampling until each level has a clean run (or the round budget is out)
    runs_n: list[dict] = []
    runs_4n: list[dict] = []
    for rnd in range(max_rounds):
        runs_n.append(run_one(f"local[{n_small}]", zpath, n_docs, calib_ref))
        runs_4n.append(run_one(f"local[{n_big}]", zpath, n_docs, calib_ref))
        have_clean = any(r["clean"] for r in runs_n) and any(r["clean"] for r in runs_4n)
        if rnd + 1 >= min_rounds and have_clean:
            break

    def best(runs: list[dict]) -> tuple[dict, bool]:
        clean = [r for r in runs if r["clean"]]
        pool = clean or runs
        b = max(pool, key=lambda r: r["tokens_per_sec"])
        b["all_runs"] = [
            {"tokens_per_sec": r["tokens_per_sec"], "clean": r["clean"],
             "spin_pre": r["spin_pre"], "spin_post": r["spin_post"]}
            for r in runs
        ]
        return b, bool(clean)

    (r_n, n_clean), (r_4n, b_clean) = best(runs_n), best(runs_4n)
    t_n, t_4n = r_n["tokens_per_sec"], r_4n["tokens_per_sec"]
    eff = (t_4n / t_n) / 4.0
    trust = "both levels measured in CLEAN windows" if (n_clean and b_clean) else (
        "WARNING: no clean window found for at least one level — efficiency "
        "below reflects tenant contention, not the code; re-run when quiet")

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    md = f"""# BENCH/BASELINE — measured scaling evidence

Protocol: BASELINE.md part 2 / north rule (BASELINE.json:14). The same
five-sketch distributed build (Bloom m=2^21 k=8 B=512 s=8, HLL p=14,
CMS eps=5e-4 delta=0.01, KLL k=200, t-digest delta=100) over the identical
deterministic corpus (FIXTURES.md F1, seed 42, {r_4n['n_docs']:,} docs,
{r_4n['total_tokens']:,} tokens), identical configs and input files, run via
`spark-submit --py-files sketchlib.zip bench/bench_sketch.py` at two
parallelism levels (the in-sandbox stand-in for N vs 4N executors, per
driver instruction). Warm-up build excluded; measured run is
scan -> mapInArrow partials -> tree merge -> collect.

Noise protocol: every run is bracketed by a calibration spin (fixed
single-core NumPy sort vs the session minimum); a run is CLEAN iff the spin
is quiet immediately before launch and after completion. Efficiency uses the
best CLEAN run per level; contaminated samples are listed for honesty.
{trust}.

| parallelism | wall s (best clean) | tokens/sec (best clean) | all runs (tokens/sec, clean?) |
|---|---|---|---|
| local[{n_small}]  (N)  | {r_n['wall_s']} | {t_n:,.0f} | {[(r['tokens_per_sec'], r['clean']) for r in runs_n]} |
| local[{n_big}] (4N) | {r_4n['wall_s']} | {t_4n:,.0f} | {[(r['tokens_per_sec'], r['clean']) for r in runs_4n]} |

**Scaling efficiency eff = (T_4N / T_N) / 4 = {eff:.3f}** (target >= 0.8).

Previous pair (round 1, same protocol, loadavg-gated best-of-4): local[1]
8,679,007 tokens/s vs local[4] 30,784,129 -> eff 0.887.

Raw results:

```json
{json.dumps(r_n)}
{json.dumps(r_4n)}
```
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as fh:
        fh.write(md)
    print(md)


if __name__ == "__main__":
    main()
