#!/usr/bin/env python
"""Scaling-efficiency evidence: the same job, same parquet input, at two
parallelism levels — local[8] vs local[32] on this 32-core box, the
sandbox stand-in for N vs 4N executors (BASELINE.md; north rule demands
efficiency ≥ 0.8 between cluster sizes).

Each level runs bench.py in a fresh subprocess (own JVM) so nothing warm
leaks between levels. The corpus is sized up (default 2.4M turns) so the
measured stages are compute-bound rather than scheduling-bound.

Writes the evidence table into BENCH_SCALING.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.abspath(__file__))
LEVELS = (8, 32)
HEADLINE = "mentions"  # the turns/sec stage (map-only, embarrassingly parallel)


def run_level(cpus: int, sf_dir: str, n_turns: int) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_SF_DIR=sf_dir,
        SPARK_GRAFT_BENCH_TURNS=str(n_turns),
    )
    out = subprocess.run(
        [sys.executable, f"{REPO}/bench.py"],
        env=env,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_turns = int(os.environ.get("SPARK_GRAFT_BENCH_TURNS", "2400000"))
    results = {c: run_level(c, sf_dir, n_turns) for c in LEVELS}

    lo, hi = LEVELS
    tp = {c: results[c]["turns_per_sec"] for c in LEVELS}
    speedup = tp[hi] / tp[lo]
    efficiency = speedup / (hi / lo)
    summary = {
        "metric": "scaling_efficiency",
        "value": round(efficiency, 3),
        "unit": "ratio",
        "levels": {str(c): results[c] for c in LEVELS},
        "turns": n_turns,
        "speedup": round(speedup, 2),
    }
    print(json.dumps(summary))

    rows = "\n".join(
        f"| local[{c}] | {results[c]['turns']} | {results[c]['queries'][HEADLINE]} "
        f"| {results[c]['turns_per_sec']:.0f} | {results[c]['queries']['kg_build']} |"
        for c in LEVELS
    )
    md = f"""# BENCH — scaling-efficiency evidence

Same job, same parquet input ({n_turns} bench turns, fixed 64-partition
layout), two parallelism levels in fresh JVMs (sandbox stand-in for N vs
4N executors per the driver instruction).

| level | turns | mention-extraction sec | turns/sec | kg_build sec |
|---|---|---|---|---|
{rows}

* speedup (turns/sec, local[{lo}]→local[{hi}]): **{speedup:.2f}×**
* scaling efficiency = speedup / ({hi}/{lo}) = **{efficiency:.3f}** (target ≥ 0.8)

Reproduce: `python bench_scaling.py` (env: SPARK_GRAFT_SF_DIR,
SPARK_GRAFT_BENCH_TURNS).
"""
    with open(f"{REPO}/BENCH_SCALING.md", "w") as f:
        f.write(md)


if __name__ == "__main__":
    main()
