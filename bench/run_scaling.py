#!/usr/bin/env python
"""Run the N-vs-4N scaling pair (local[8] vs local[32]) via spark-submit
--py-files sketchlib.zip (the north-rule invocation form) and write
BENCH/BASELINE.md with throughputs + scaling efficiency."""

from __future__ import annotations

import json
import os
import subprocess
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def make_zip() -> str:
    zpath = os.path.join(REPO, ".cache", "sketchlib.zip")
    os.makedirs(os.path.dirname(zpath), exist_ok=True)
    with zipfile.ZipFile(zpath, "w") as z:
        pkg = os.path.join(REPO, "sketchlib")
        for fn in sorted(os.listdir(pkg)):
            if fn.endswith(".py"):
                z.write(os.path.join(pkg, fn), f"sketchlib/{fn}")
    return zpath


def run_one(master: str, zpath: str, n_docs: int) -> dict:
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
    for line in out.stdout.splitlines():
        line = line.strip()
        if line.startswith("{") and "tokens_per_sec" in line:
            return json.loads(line)
    sys.stderr.write(out.stdout[-3000:] + "\n" + out.stderr[-3000:])
    raise RuntimeError(f"no result line from {master}")


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    zpath = make_zip()
    r8 = run_one("local[8]", zpath, n_docs)
    r32 = run_one("local[32]", zpath, n_docs)
    t8, t32 = r8["tokens_per_sec"], r32["tokens_per_sec"]
    eff = (t32 / t8) / 4.0

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    md = f"""# BENCH/BASELINE — measured scaling evidence

Protocol: BASELINE.md part 2 / north rule (BASELINE.json:14). The same
five-sketch distributed build (Bloom m=2^27 k=8 B=512 s=8, HLL p=14,
CMS eps=5e-4 delta=0.01, KLL k=200, t-digest delta=100) over the identical
deterministic corpus (FIXTURES.md F1, seed 42, {r32['n_docs']:,} docs,
{r32['total_tokens']:,} tokens), identical configs and input files, run via
`spark-submit --py-files sketchlib.zip bench/bench_sketch.py` at two
parallelism levels on this 32-core host (the in-sandbox stand-in for N vs 4N
executors, per driver instruction). Warm-up build excluded; measured run is
scan -> mapInArrow partials -> tree merge -> collect.

| parallelism | wall s | tokens/sec |
|---|---|---|
| local[8]  (N)  | {r8['wall_s']} | {t8:,.0f} |
| local[32] (4N) | {r32['wall_s']} | {t32:,.0f} |

**Scaling efficiency eff = (T_32 / T_8) / 4 = {eff:.3f}** (target >= 0.8).

Raw results:

```json
{json.dumps(r8)}
{json.dumps(r32)}
```
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as fh:
        fh.write(md)
    print(md)


if __name__ == "__main__":
    main()
