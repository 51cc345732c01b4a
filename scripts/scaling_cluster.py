#!/usr/bin/env python
"""N vs 4N EXECUTOR scaling evidence via local-cluster mode (round 2).

The north rule's criterion is >=0.8 throughput scaling efficiency from
N to 4N *executors*. Round-1/2 thread-mode measurements (local[8] vs
local[32]) share one JVM heap, one allocator and one shuffle server
across all threads — exactly the resources a real cluster multiplies
when adding executors. local-cluster[n,4,mem] removes that confound:
each executor is a SEPARATE JVM process with its own heap, GC, Python
workers and shuffle-IO threads, registered with a real standalone-style
scheduler, and the package ships via the addPyFile/--py-files contract
(session._ship_package). This is the closest realization of "N and 4N
executors" a single box admits; the remaining shared resources are the
physical memory bus and one disk.

Runs, each in a fresh subprocess (never two Spark clusters at once):

  N  = local-cluster[2,4,6144]   (2 executors x 4 cores = 8 slots)
  4N = local-cluster[8,4,6144]   (8 executors x 4 cores = 32 slots)

for the per-stage workers from scaling_stages.py (extract / tokenize /
encode) plus the end-to-end checkpointed index build, with the same
fixed input. Efficiency = (thr@4N / thr@N) / 4. The cpu baseline from
scaling_stages.py (pure processes) is re-used as the box ceiling.
Appends a table to BENCH.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

_REPO = str(Path(__file__).resolve().parents[1])
_STAGES_PY = str(Path(__file__).with_name("scaling_stages.py"))

N_PAGES = int(os.environ.get("SPARK_GRAFT_SCALE_PAGES", "200000"))
EXEC_MB = int(os.environ.get("SPARK_GRAFT_EXEC_MB", "6144"))
STAGES = ["cpu", "extract", "tokenize", "encode", "index"]


def _run(stage: str, n_exec: int) -> float:
    if stage == "cpu":
        size = str(n_exec * 4)
    else:
        size = f"local-cluster[{n_exec},4,{EXEC_MB}]"
    env = dict(os.environ)
    # local-cluster executors get memory from the master string; keep
    # the session override consistent
    env["SPARK_EXECUTOR_MEM"] = f"{EXEC_MB}m"
    out = subprocess.run(
        [sys.executable, _STAGES_PY, "--worker", stage, size, str(N_PAGES)],
        capture_output=True, text=True, cwd=_REPO, env=env,
    )
    lines = [ln for ln in out.stdout.strip().splitlines()
             if ln.startswith("{")]
    if not lines:
        sys.stderr.write(out.stdout[-2000:] + "\n" + out.stderr[-4000:])
        raise SystemExit(f"worker failed: {stage} {size}")
    return json.loads(lines[-1])["throughput"]


def main() -> None:
    results: dict = {}
    for stage in STAGES:
        for n_exec in (2, 8):
            thr = _run(stage, n_exec)
            results[(stage, n_exec)] = thr
            print(f"{stage} @ {n_exec} executors x4: {thr}", file=sys.stderr)

    ceiling = (results[("cpu", 8)] / results[("cpu", 2)]) / 4.0
    lines = [
        "",
        f"## N vs 4N EXECUTORS — local-cluster mode (pages={N_PAGES})",
        "",
        f"Separate executor JVMs ({EXEC_MB} MB heap each), package shipped",
        "via addPyFile (--py-files contract), fresh subprocess per run,",
        "sequential. N = 2 executors x 4 cores, 4N = 8 executors x 4 cores.",
        "",
        "| stage | thr @N (2 exec) | thr @4N (8 exec) | eff (4N/N)/4 |"
        " of CPU ceiling |",
        "|---|---|---|---|---|",
    ]
    for stage in STAGES:
        t_n, t_4n = results[(stage, 2)], results[(stage, 8)]
        eff = (t_4n / t_n) / 4.0
        rel = eff / ceiling if stage != "cpu" else 1.0
        unit = "items/s" if stage == "cpu" else "pages/s"
        lines.append(
            f"| {stage} | {t_n} {unit} | {t_4n} {unit} | {eff:.3f} |"
            f" {rel:.2f} |"
        )
    lines += [
        "",
        f"CPU ceiling (pure processes): eff {ceiling:.3f} — the box's",
        "process-level scaling limit (SMT + one memory bus + one disk),",
        "which 4N real cluster nodes would not share.",
    ]
    with open(os.path.join(_REPO, "BENCH.md"), "a") as f:
        f.write("\n".join(lines) + "\n")
    print(json.dumps(
        {f"{k[0]}@{k[1]}exec": v for k, v in results.items()}
        | {"ceiling_eff": round(ceiling, 3)}))


if __name__ == "__main__":
    main()
