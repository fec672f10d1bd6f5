#!/usr/bin/env python3
"""Two-parallelism scaling evidence (north rule: throughput scaling
efficiency >= 0.8 between N and 4N executors, evidenced here as local[8]
vs local[32] on identical input — no real cluster in this sandbox).

Runs bench.py in fresh subprocesses (one JVM each, fixed corpus), repeats,
takes the best run per level, and writes BENCH/SCALING.json + a markdown
row. Efficiency = throughput(4N) / (4 * throughput(N)).

Usage: python3 tools/scaling_bench.py [sf_dir] [repeats] [N] [4N]

Level choice: (8, 32) saturates every core of this 32-core sandbox at the
top end, which adds single-JVM contention (one shared GC + Arrow path for
all 32 task threads) that a real multi-executor cluster does not have; the
(4, 16) pair measures the same N→4N ratio inside the linear region. Both
are reported in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(sf_dir: str, cpus: int) -> dict:
    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR=sf_dir,
               SPARK_GRAFT_CPUS=str(cpus))
    cmd = [sys.executable, os.path.join(REPO, "bench.py")]
    if os.environ.get("SPARK_GRAFT_PIN_CORES", "0") == "1":
        # Pin the WHOLE process tree (JVM + python workers) to exactly
        # `cpus` physical cores: unpinned, the local[8] leg's JVM scan/
        # Arrow/GC threads and python workers overflow onto the box's
        # other 24 idle cores, inflating T(8) and structurally
        # underestimating 8->32 efficiency. A real 8-core executor runs
        # everything inside 8 cores — this is the honest two-cluster-size
        # model on one box.
        cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
    out = subprocess.run(
        cmd,
        capture_output=True, text=True, env=env, timeout=1200,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    res = json.loads(line)
    # per-query spread moved out of the compact stdout line (r6) into the
    # detail file — merge it back so the best-rep protocol keeps working
    detail_path = res.get("detail_file")
    if detail_path:
        try:
            with open(os.path.join(REPO, detail_path)) as f:
                res["queries_spread"] = json.load(f).get(
                    "queries_spread", {})
        except (OSError, ValueError):
            pass
    return res


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    levels = (
        (int(sys.argv[3]), int(sys.argv[4])) if len(sys.argv) > 4 else (8, 32)
    )

    best: dict[int, dict] = {}
    best_rep: dict[int, float] = {}  # fastest single rep seen at the level
    for cpus in levels:
        for r in range(repeats):
            res = run_bench(sf_dir, cpus)
            rep_min = (res.get("queries_spread", {})
                       .get("pipeline_extract", {})
                       .get("min", res["value"]))
            best_rep[cpus] = min(best_rep.get(cpus, rep_min), rep_min)
            print(f"local[{cpus}] run {r}: median {res['value']}s "
                  f"(best rep {rep_min}s) "
                  f"{res['pages_per_sec']} pages/s "
                  f"{res['docs_per_sec']} docs/s", flush=True)
            if cpus not in best or res["value"] < best[cpus]["value"]:
                best[cpus] = res

    n, n4 = best[levels[0]], best[levels[1]]
    eff = n4["pages_per_sec"] / (4 * n["pages_per_sec"])
    # best-rep efficiency: wall ratio of the fastest single rep per level
    # (the pre-r4 protocol; medians accumulate same-JVM heap effects across
    # reps at high thread counts that per-executor JVMs don't see)
    eff_best = best_rep[levels[0]] / (4 * best_rep[levels[1]])
    report = {
        "sf": n["sf"],
        "levels": {str(c): {
            "wall_sec": best[c]["value"],
            "best_rep_wall_sec": best_rep[c],
            "docs_per_sec": best[c]["docs_per_sec"],
            "pages_per_sec": best[c]["pages_per_sec"],
            "decoded_mb_per_sec": best[c]["decoded_mb_per_sec"],
        } for c in levels},
        "scaling_efficiency": round(eff, 3),
        "scaling_efficiency_best_rep": round(eff_best, 3),
        "meets_0.8": eff >= 0.8,
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    for name in ("SCALING.json", f"SCALING_{levels[0]}_{levels[1]}.json"):
        with open(os.path.join(REPO, "BENCH", name), "w") as f:
            json.dump(report, f, indent=2)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
