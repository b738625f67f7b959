#!/usr/bin/env bash
# Full local gate sequence (mirrors the driver's t1/t2/bench).
set -e
cd "$(dirname "$0")/.."
echo "== specs =="
sbt -batch test
echo "== correctness (t2 mirror) =="
rm -rf /tmp/graft_vout
SPARK_GRAFT_CPUS=8 sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/graft_vout"
python3 tools/check.py /root/testdata/sf0.01 /tmp/graft_vout
echo "== bench =="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Bench"
