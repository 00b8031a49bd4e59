#!/bin/bash
# One-command round gate: compile → Verify dump at sf0.01 → DuckDB
# oracle compare (type-aware, writes a driver-shaped JSON) → COVERAGE.md
# drift check → full ScalaTest suite. Exits non-zero on the first red.
set -e
cd "$(dirname "$0")/.."
sbt -batch compile
rm -rf /tmp/graft_verify_out
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/graft_verify_out"
python3 tools/oracle_check.py --json /tmp/GRAFT_CORRECTNESS_local.json \
  /root/testdata/sf0.01 /tmp/graft_verify_out
python3 tools/update_coverage.py --check /tmp/GRAFT_CORRECTNESS_local.json
sbt -batch test
echo "ROUND CHECK GREEN"
