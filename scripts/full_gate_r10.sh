#!/bin/bash
set -e
cd /root/repo
echo "=== sbt test ==="
sbt -batch test 2>&1 | grep -E "Tests: succeeded|All tests passed|\*\*\* [0-9]+ TEST|error]" | tail -20
echo "=== Verify sf0.01 ==="
rm -rf /tmp/vfy_r10full
SPARK_GRAFT_CPUS=8 sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/vfy_r10full" 2>&1 | tail -2
echo "=== check_oracle ==="
python3 scripts/check_oracle.py /root/testdata/sf0.01 /tmp/vfy_r10full 2>/dev/null | tail -5
echo "=== GATE DONE ==="
