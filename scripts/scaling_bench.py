"""Scaling-efficiency evidence (BASELINE.json north_rule): run bench.py
at N and 4N local cores on the SAME input and report throughput at
both plus efficiency = (T_4N / T_N) / 4. Writes BENCH/BASELINE.md.

In-sandbox substitute for a real N- vs 4N-executor cluster (driver
instruction): local[8] vs local[32] on one machine.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(cpus: int, sf_dir: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus),
               SPARK_GRAFT_SF_DIR=sf_dir)
    out = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                         env=env, capture_output=True, text=True, check=True)
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_small = int(os.environ.get("GUACKG_SCALE_N", "8"))
    n_big = 4 * n_small

    r_small = run_bench(n_small, sf_dir)
    r_big = run_bench(n_big, sf_dir)
    t_small, t_big = r_small["value"], r_big["value"]
    eff = (t_big / t_small) / (n_big / n_small)

    md = f"""# BENCH/BASELINE — measured numbers (guackg)

Generated {time.strftime('%Y-%m-%d %H:%M:%SZ', time.gmtime())} on
local mode, same machine, same input ({r_small['pages']} synthetic
webtext pages at SF={r_small['sf']}), per the driver instruction that
two parallelism levels substitute for two cluster sizes.

| config | pages | triples | triples/sec | pages/sec | pipeline sec |
|---|---|---|---|---|---|
| local[{n_small}] (N) | {r_small['pages']} | {r_small['triples']} | {t_small} | {r_small['pages_per_sec']} | {r_small['queries']['kg_pipeline_e2e']} |
| local[{n_big}] (4N) | {r_big['pages']} | {r_big['triples']} | {t_big} | {r_big['pages_per_sec']} | {r_big['queries']['kg_pipeline_e2e']} |

**Scaling efficiency (N→4N): {eff:.3f}** (target ≥ 0.8 per
BASELINE.json; efficiency = (T_4N/T_N)/4).

Operator query timings at local[{n_big}] (seconds):

{json.dumps(r_big['queries'], indent=2)}
"""
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print(json.dumps({"t_n": t_small, "t_4n": t_big,
                      "efficiency": round(eff, 3)}))


if __name__ == "__main__":
    main()
