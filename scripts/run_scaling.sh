#!/usr/bin/env bash
# Two-parallelism scaling evidence (sandbox proxy for N vs 4N executors):
# identical job + input at local[8] and local[32]; efficiency =
# (throughput@32 / throughput@8) / 4. Results appended to BENCH.md.
set -euo pipefail
cd "$(dirname "$0")/.."
SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}"

echo "running local[8]..." >&2
R8=$(SPARK_GRAFT_CPUS=8 SPARK_GRAFT_SF_DIR="$SF_DIR" python bench.py 2>/dev/null | tail -1)
echo "running local[32]..." >&2
R32=$(SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR="$SF_DIR" python bench.py 2>/dev/null | tail -1)

python - "$R8" "$R32" <<'EOF'
import json, sys, datetime
r8, r32 = json.loads(sys.argv[1]), json.loads(sys.argv[2])
# scaling measured on the index-build stage (the throughput metric of the
# north rule): docs/sec at both parallelism levels
t8, t32 = r8["index_docs_per_sec"], r32["index_docs_per_sec"]
eff = (t32 / t8) / 4.0
lines = [
    "",
    f"## Scaling run {datetime.date.today().isoformat()} (sf={r8['sf']})",
    "",
    "| parallelism | index docs/sec | WAND p50 ms | WAND p99 ms | suite sec |",
    "|---|---|---|---|---|",
    f"| local[8] (N) | {t8} | {r8['wand_p50_ms']} | {r8['wand_p99_ms']} | {r8['value']} |",
    f"| local[32] (4N) | {t32} | {r32['wand_p50_ms']} | {r32['wand_p99_ms']} | {r32['value']} |",
    "",
    f"**Index-build scaling efficiency (throughput@4N / throughput@N) / 4 = {eff:.3f}**",
    "",
    f"raw local[8]: `{json.dumps(r8)}`",
    "",
    f"raw local[32]: `{json.dumps(r32)}`",
]
with open("BENCH.md", "a") as f:
    f.write("\n".join(lines) + "\n")
print(json.dumps({"eff": round(eff, 3), "docs_per_sec_8": t8, "docs_per_sec_32": t32}))
EOF
