#!/usr/bin/env bash
# Session-close correctness guard (VERDICT r11 #1: round 11 shipped with an
# EMPTY driver correctness artifact). Run this before the final commit of a
# session; it fails loudly unless the FULL gate is green:
#
#   1. graft.Verify writes every declared query's output + oracle_sql.json
#   2. the output count must equal the declared query count (no silent
#      partial run)
#   3. the DuckDB replay (tools/localverify.py) must report 0 fail
#
# Usage: tools/gatecheck.sh [sfDir] [outDir]
#
# Defaults: local[4] + 16 verify threads — measured fastest at sf0.01
# (340 queries / 147 s; local[16] was 427 s: 4x the tasks per tiny-job
# barrier buys nothing on planning-bound oracle queries).
set -euo pipefail
cd "$(dirname "$0")/.."
SF="${1:-/root/testdata/sf0.01}"
OUT="${2:-/tmp/gatecheck_out}"
rm -rf "$OUT"

SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-4}" \
SPARK_GRAFT_VERIFY_THREADS="${SPARK_GRAFT_VERIFY_THREADS:-16}" \
  sbt -batch "runMain graft.Verify $SF $OUT" 2>&1 | tail -3

# Declared query count = number of oracle entries is a lower bound only
# (rows-only queries have no oracle); count output dirs vs the summary line.
N_OUT=$(find "$OUT" -mindepth 1 -maxdepth 1 -type d | wc -l)
N_ORACLE=$(python3 -c "import json;print(len(json.load(open('$OUT/oracle_sql.json'))))")
echo "gatecheck: $N_OUT output dirs, $N_ORACLE oracle entries"
if [ "$N_OUT" -lt "$N_ORACLE" ]; then
  echo "gatecheck: FAIL — fewer outputs ($N_OUT) than oracle entries ($N_ORACLE)" >&2
  exit 1
fi

python3 tools/localverify.py "$SF" "$OUT" | tail -1
# localverify exits nonzero on any fail; set -e propagates it.
echo "gatecheck: GREEN ($N_OUT queries)"
