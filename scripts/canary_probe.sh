#!/bin/bash
# Three consecutive fixed-work canary readings (VERDICT r12 item 1:
# adjudicate host quietness BEFORE cutting a definitive archive; done =
# spread <= ~1.2x across three probes). Each Bench run records its own
# min-of-3 canary; we run a 1-query battery to get three independent
# canary lines cheaply.
set -e
cd "$(dirname "$0")/.."
for i in 1 2 3; do
  # Bench prints TWO metric lines since round 14 (full first, compact
  # last — the driver-tail fix); either carries the canary, take the last
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.001 SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} \
  SPARK_GRAFT_ONLY=q02_status_topk sbt -batch "runMain graft.Bench" 2>/dev/null \
    | grep '"metric"' | sed 's/^\[info\] //' | tail -n 1 \
    | python3 -c 'import json,sys; print("canary", json.loads(sys.stdin.read())["canary"])'
done
