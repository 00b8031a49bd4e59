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
# Fast execution sweep of the full registered surface at sf0.001:
# Bench now exits non-zero when ANY query errors, so an analysis-time
# breakage (e.g. a testdata schema/encoding flip) is caught here even
# when it doesn't change oracle rows — the class of miss that let the
# round-5 TIMESTAMP_NTZ regression ride into the driver gate.
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.001 sbt -batch "runMain graft.Bench"
echo "ROUND CHECK GREEN"
