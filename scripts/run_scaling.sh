#!/usr/bin/env bash
# Two-parallelism scaling evidence (sandbox proxy for N vs 4N executors):
# the identical job + input at local[8] (N) and local[32] (4N).
# efficiency = (throughput@4N / throughput@N) / 4. Appended to BENCH.md.
#
# Mode notes (both were measured; see BENCH.md analysis):
#  * local[k] shares one JVM — no IPC, but shared heap/allocator.
#  * SPARK_GRAFT_LOCAL_CLUSTER=1 switches to local-cluster[2,4,M] vs
#    [8,4,M]: real executor JVMs (the truer "N vs 4N executors" shape)
#    but pays loopback shuffle + 8-JVM memory-bandwidth contention on
#    this single box.
set -euo pipefail
cd "$(dirname "$0")/.."
SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}"
MEM_MB="${SPARK_GRAFT_WORKER_MB:-7168}"

if [ "${SPARK_GRAFT_LOCAL_CLUSTER:-0}" = "1" ]; then
  export SPARK_EXECUTOR_JAVA_OPTS="-XX:+UnlockDiagnosticVMOptions -XX:GCLockerRetryAllocationCount=64 -XX:ActiveProcessorCount=4"
  M_N="local-cluster[2,4,${MEM_MB}]"
  M_4N="local-cluster[8,4,${MEM_MB}]"
  L_N="2 executors x 4 cores (N)"
  L_4N="8 executors x 4 cores (4N)"
else
  M_N="local[8]"
  M_4N="local[32]"
  L_N="local[8] (N)"
  L_4N="local[32] (4N)"
fi

echo "running N = ${M_N} ..." >&2
R8=$(SPARK_GRAFT_CPUS=8 SPARK_GRAFT_MASTER="$M_N" \
     SPARK_GRAFT_SF_DIR="$SF_DIR" python bench.py 2>/dev/null | tail -1)
echo "running 4N = ${M_4N} ..." >&2
R32=$(SPARK_GRAFT_CPUS=32 SPARK_GRAFT_MASTER="$M_4N" \
      SPARK_GRAFT_SF_DIR="$SF_DIR" python bench.py 2>/dev/null | tail -1)

L_N="$L_N" L_4N="$L_4N" python - "$R8" "$R32" <<'EOF'
import json, os, sys, datetime
r8, r32 = json.loads(sys.argv[1]), json.loads(sys.argv[2])
t8, t32 = r8["index_docs_per_sec"], r32["index_docs_per_sec"]
eff = (t32 / t8) / 4.0
lines = [
    "",
    f"## Scaling run {datetime.date.today().isoformat()} (sf={r8['sf']}, pages={r8['pages_docs']})",
    "",
    "| cluster size | index docs/sec | WAND p50 ms | WAND p99 ms |",
    "|---|---|---|---|",
    f"| {os.environ['L_N']} | {t8} | {r8['wand_p50_ms']} | {r8['wand_p99_ms']} |",
    f"| {os.environ['L_4N']} | {t32} | {r32['wand_p50_ms']} | {r32['wand_p99_ms']} |",
    "",
    f"**Index-build scaling efficiency (throughput@4N / throughput@N) / 4 = {eff:.3f}**",
    "",
    f"raw N: `{json.dumps(r8)}`",
    "",
    f"raw 4N: `{json.dumps(r32)}`",
]
with open("BENCH.md", "a") as f:
    f.write("\n".join(lines) + "\n")
print(json.dumps({"eff": round(eff, 3), "docs_per_sec_N": t8, "docs_per_sec_4N": t32}))
EOF
