#!/usr/bin/env python
"""Hardware-partitioned N vs 4N executor scaling (round 3).

Round 2 measured true executor scaling (separate JVMs via
local-cluster) but both cluster sizes could schedule threads across ALL
32 cores: the N run's GC/Python/shuffle threads borrowed idle cores and
memory bandwidth the 4N run had to share, understating efficiency. This
round partitions the hardware:

  * the N run (2 executors x 4 cores) is pinned with ``taskset -c 0-7``
    — it owns exactly 8 cores, nothing more, driver included;
  * the 4N run (8 executors x 4 cores) gets ``taskset -c 0-31`` — all
    32 cores, driver included. Symmetric treatment (driver inside each
    allocation) keeps the resource ratio exactly 4x; the driver's
    constant scheduling work is proportionally heavier on N, which can
    inflate efficiency by a few percent — noted, not corrected.
  * spark.local.dir (shuffle spill) AND the checkpointed store live on
    tmpfs (/dev/shm): round 2's disk-isolation run showed the one
    shared NVMe was the binding confound at 4N (+53% on tmpfs).

This is the closest a single box gets to "4 separate nodes with their
own cores": the only remaining shared resource is the memory bus
itself, which 4N real machines would multiply. The cpu stage (pure
processes, no Spark) measures that residual ceiling under the SAME
pinning, so each Spark stage is also reported as a fraction of the
physically achievable scaling.

Efficiency = (throughput@4N / throughput@N) / 4. Appends to BENCH.md.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
from pathlib import Path

_REPO = str(Path(__file__).resolve().parents[1])
_STAGES_PY = str(Path(__file__).with_name("scaling_stages.py"))

N_PAGES = int(os.environ.get("SPARK_GRAFT_SCALE_PAGES", "200000"))
EXEC_MB = int(os.environ.get("SPARK_GRAFT_EXEC_MB", "6144"))
STAGES = ["cpu", "extract", "tokenize", "encode", "index"]


def _run(stage: str, n_exec: int) -> float:
    cores = "0-7" if n_exec == 2 else "0-31"
    if stage == "cpu":
        size = str(n_exec * 4)
    else:
        size = f"local-cluster[{n_exec},4,{EXEC_MB}]"
    shm = f"/dev/shm/scale-pinned-{os.getpid()}"
    os.makedirs(os.path.join(shm, "local"), exist_ok=True)
    os.makedirs(os.path.join(shm, "tmp"), exist_ok=True)
    env = dict(os.environ)
    env["SPARK_EXECUTOR_MEM"] = f"{EXEC_MB}m"
    env["SPARK_LOCAL_DIRS"] = os.path.join(shm, "local")
    env["TMPDIR"] = os.path.join(shm, "tmp")
    try:
        out = subprocess.run(
            ["taskset", "-c", cores, sys.executable, _STAGES_PY,
             "--worker", stage, size, str(N_PAGES)],
            capture_output=True, text=True, cwd=_REPO, env=env,
        )
        lines = [ln for ln in out.stdout.strip().splitlines()
                 if ln.startswith("{")]
        if not lines:
            sys.stderr.write(out.stdout[-2000:] + "\n" + out.stderr[-4000:])
            raise SystemExit(f"worker failed: {stage} {size} cores={cores}")
        return json.loads(lines[-1])["throughput"]
    finally:
        shutil.rmtree(shm, ignore_errors=True)


def main() -> None:
    results: dict = {}
    for stage in STAGES:
        for n_exec in (2, 8):
            thr = _run(stage, n_exec)
            results[(stage, n_exec)] = thr
            print(f"{stage} @ {n_exec} exec x4 (pinned): {thr}",
                  file=sys.stderr)

    ceiling = (results[("cpu", 8)] / results[("cpu", 2)]) / 4.0
    lines = [
        "",
        f"## N vs 4N EXECUTORS — core-pinned + tmpfs (round 3, "
        f"pages={N_PAGES})",
        "",
        "taskset-partitioned hardware: the N run (2 executor JVMs x 4",
        "cores) owns cores 0-7 ONLY (driver included); the 4N run (8",
        "executor JVMs x 4 cores) owns all 32. Shuffle spill",
        "(spark.local.dir) and the checkpointed store on tmpfs — the",
        "shared NVMe confound measured in round 2 is out. `cpu` is the",
        "pure-process ceiling under identical pinning (the memory-bus",
        "residual a real 4-node cluster would not share).",
        "",
        "| stage | thr @N (8 cores) | thr @4N (32 cores) | eff | "
        "of cpu ceiling |",
        "|---|---|---|---|---|",
    ]
    for stage in STAGES:
        a, b = results[(stage, 2)], results[(stage, 8)]
        eff = (b / a) / 4.0
        frac = "" if stage == "cpu" else f"{eff / ceiling:.2f}"
        unit = "items/s" if stage == "cpu" else "pages/s"
        lines.append(
            f"| {stage} | {a:,.0f} {unit} | {b:,.0f} {unit} | "
            f"{eff:.3f} | {frac} |"
        )
    lines.append("")
    with open(os.path.join(_REPO, "BENCH.md"), "a") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
