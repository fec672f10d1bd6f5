#!/usr/bin/env python3
"""ONE-session scaling evidence (r6 verdict #1): the pinned in-JVM 8->32
ladder, the multi-JVM 4->16 executor analogue, AND the same-moment
pure-CPU ceiling, measured back-to-back by one process and written to a
single artifact with the ratio-to-ceiling stated for both.

Why: this box drifts 15-25% hour-over-hour and its core-scaling ceiling
(turbo/co-tenancy) differs day to day, so a ladder measured in one window
against a ceiling measured in another is unadjudicable — r6's 0.570
ladder vs a same-day-but-different-window 0.85 control read as 0.67x of
ceiling while r5's same-session pair read 0.855x. This tool removes the
window variable: every number in the artifact shares one session.

Components:
  1. pure-CPU ceiling — K pinned processes (cores 0..K-1) each running
     the bench.py LCG loop; aggregate Mops at 4/8/16/32 active cores.
     eff_8_32 and eff_4_16 are the host's own core-scaling ratios; no
     Spark job can beat them.
  2. pinned in-JVM ladder — tools/scaling_bench.py local[8] vs local[32]
     (SPARK_GRAFT_PIN_CORES=1, SKIP_QUERIES=1) on the SF1 corpus.
  3. multi-JVM analogue — tools/multi_jvm_scaling.py, 1 vs 4 pinned JVMs
     x local[4] (4->16 cores, 3g heaps) on the same corpus: the truest
     local model of "N vs 4N executors" (no shared GC/Arrow path).

Writes BENCH/SCALING_SESSION_r7.json.

Usage: python3 tools/scaling_session.py [n_docs] [ladder_reps] [mjvm_reps]
                                        [lo hi]
Default legs are (8, 32); pass `2 8` for the linear-region N->4N pair the
north rule actually grades (ladder local[2]->local[8] plus a 1v4 x
local[2] executor analogue on the same 2->8 core pair) — written to
BENCH/SCALING_SESSION_2_8_r7.json.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

LCG_ITERS = 30_000_000  # ~3 s per process: long enough to ride out turbo


def _lcg_worker(core: int, barrier, out_q) -> None:
    try:
        os.sched_setaffinity(0, {core})
    except OSError:
        pass
    x = 123456789
    barrier.wait()
    t0 = time.perf_counter()
    for _ in range(LCG_ITERS):
        x = (x * 1103515245 + 12345) & 0xFFFFFFFFFFFF
    wall = time.perf_counter() - t0
    if x == 0:
        print("", end="")
    out_q.put(wall)


def ceiling_level(k: int) -> float:
    """Aggregate Mops with exactly k cores active (pinned 0..k-1)."""
    barrier = mp.Barrier(k)
    out_q = mp.Queue()
    procs = [mp.Process(target=_lcg_worker, args=(i, barrier, out_q))
             for i in range(k)]
    for p in procs:
        p.start()
    walls = [out_q.get() for _ in procs]
    for p in procs:
        p.join()
    return round(sum(LCG_ITERS / w for w in walls) / 1e6, 1)


def measure_ceiling(levels: tuple[int, ...] = (4, 8, 16, 32)) -> dict:
    mops = {k: ceiling_level(k) for k in levels}
    out = {"mops": {str(k): v for k, v in mops.items()}}
    for k in levels:
        if 4 * k in mops:
            out[f"eff_{k}_{4 * k}"] = round(mops[4 * k] / (4 * mops[k]), 3)
    return out


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 40000
    ladder_reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    mjvm_reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    lo, hi = ((int(sys.argv[4]), int(sys.argv[5]))
              if len(sys.argv) > 5 else (8, 32))
    # The session's arithmetic requires a 4x leg pair: measure_ceiling
    # emits only eff_{k}_{4k} ratios, and the lad_ceil lookup below would
    # otherwise KeyError AFTER the hour-long measurement, discarding it.
    if hi != 4 * lo:
        sys.exit(f"legs must be (N, 4N); got ({lo}, {hi})")
    # executor analogue: 1 vs 4 JVMs, each local[hi//4] — with hi == 4*lo
    # that is the SAME (lo -> hi) core pair as the in-JVM ladder, so both
    # instruments and the pure-CPU ceiling speak about one pair. (The
    # committed BENCH/SCALING_SESSION_r7.json predates this
    # parameterization and carries the r5/r6 local[4] 4->16 analogue next
    # to an 8->32 ladder; its methodology string records that.)
    mj_cores = max(1, hi // 4)
    ceil_levels = tuple(sorted({lo, hi, mj_cores, 4 * mj_cores}))

    from bench import cpu_control_mops

    t_start = time.time()
    report: dict = {"corpus_docs": n_docs, "legs": [lo, hi]}
    report["single_core_control_mops_start"] = cpu_control_mops()

    print(f"[1/4] pure-CPU ceiling (pinned LCG at {ceil_levels} cores)",
          flush=True)
    report["ceiling"] = measure_ceiling(ceil_levels)
    print(json.dumps(report["ceiling"]), flush=True)

    env = dict(os.environ,
               SPARK_GRAFT_PIN_CORES="1",
               SPARK_GRAFT_SKIP_QUERIES="1",
               SPARK_GRAFT_NDOCS=str(n_docs),
               SPARK_GRAFT_PDF="1",
               SPARK_GRAFT_SF_DIR="/root/testdata/sf0.1")

    print(f"[2/4] pinned in-JVM ladder {lo}->{hi}", flush=True)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "scaling_bench.py"),
         "/root/testdata/sf0.1", str(ladder_reps), str(lo), str(hi)],
        env=env, capture_output=True, text=True, timeout=5400)
    sys.stdout.write(out.stdout)
    if out.returncode != 0:
        raise RuntimeError(f"ladder failed:\n{out.stderr[-2000:]}")
    ladder_key = f"ladder_{lo}_{hi}"
    report[ladder_key] = json.loads(
        [l for l in out.stdout.strip().splitlines()
         if l.startswith("{")][-1])

    print(f"[3/4] multi-JVM 1v4 x local[{mj_cores}] "
          f"({mj_cores}->{4 * mj_cores} cores)", flush=True)
    env_m = dict(env, SPARK_GRAFT_MJVM_MEM="3g",
                 SPARK_GRAFT_MJVM_CORES=str(mj_cores))
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "multi_jvm_scaling.py"),
         str(n_docs), str(mjvm_reps), "1", "4"],
        env=env_m, capture_output=True, text=True, timeout=5400)
    sys.stdout.write(out.stdout)
    if out.returncode != 0:
        raise RuntimeError(f"multi-JVM failed:\n{out.stderr[-2000:]}")
    report["multi_jvm_1v4"] = json.loads(
        [l for l in out.stdout.strip().splitlines()
         if l.startswith("{")][-1])

    print("[4/4] closing controls", flush=True)
    report["single_core_control_mops_end"] = cpu_control_mops()
    report["ceiling_end"] = measure_ceiling(ceil_levels)

    lad = report[ladder_key]["scaling_efficiency"]
    lad_best = report[ladder_key].get("scaling_efficiency_best_rep")
    mj = report["multi_jvm_1v4"]["scaling_efficiency"]
    ceil = report["ceiling"]
    lad_ceil = ceil[f"eff_{lo}_{hi}"]
    mj_ceil = ceil[f"eff_{mj_cores}_{4 * mj_cores}"]
    report["ratio_to_ceiling"] = {
        ladder_key: round(lad / lad_ceil, 3),
        f"{ladder_key}_best_rep": (round(lad_best / lad_ceil, 3)
                                   if lad_best else None),
        f"multi_jvm_{mj_cores}_{4 * mj_cores}": round(mj / mj_ceil, 3),
        "note": ("every component of these ratios was measured in THIS "
                 "session; ceiling_end shows intra-session drift"),
    }
    report["session_wall_min"] = round((time.time() - t_start) / 60, 1)

    # the name always carries the legs AND the round: a rerun must never
    # clobber a committed artifact that recorded a different instrument
    # or a different round's box state (the hardcoded r7 tag would have
    # silently overwritten the committed r7 record in round 8 — same
    # lesson as the per-config bench detail files, r6). Round = max round
    # number parsed from the driver CORRECTNESS filenames + 1 (a COUNT
    # breaks on gaps or when the driver has already written the current
    # round's file — advice r8), overridable for ad-hoc runs.
    import glob
    import re

    rounds = [
        int(m.group(1))
        for p in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
        if (m := re.search(r"CORRECTNESS_r(\d+)\.json$", p))
    ]
    tag = os.environ.get("SPARK_GRAFT_SCALING_TAG") or "r{}".format(
        (max(rounds) if rounds else 0) + 1)
    name = f"SCALING_SESSION_{lo}_{hi}_{tag}.json"
    out_path = os.path.join(REPO, "BENCH", name)
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({"ratio_to_ceiling": report["ratio_to_ceiling"],
                      "ladder": lad, "mjvm": mj,
                      "ceiling": ceil}), flush=True)


if __name__ == "__main__":
    main()
