#!/usr/bin/env bash
# One-command replica of the driver's correctness gate (VERDICT r13 #8):
# graft.Verify dumps every SparkEntry query to parquet, then
# tools/oracle_check.py re-runs each oracle SQL in DuckDB over the same
# corpus and compares. Exit code 0 = every checked entry passed.
#
# Usage: tools/verify_and_check.sh <sfDir> [outDir] [names_csv]
#   tools/verify_and_check.sh /root/testdata/sf0.01
#   tools/verify_and_check.sh /root/testdata/sf0.1 /tmp/out q1_agg,knn_cosine
#
# SPARK_GRAFT_CPUS (default 4) sizes the local master, as in Verify.main.
set -euo pipefail
sf="${1:?usage: tools/verify_and_check.sh <sfDir> [outDir] [names_csv]}"
out="${2:-/tmp/graft_verify_$(basename "$sf")}"
names="${3:-}"
cd "$(dirname "$0")/.."
sbt -batch "runMain graft.Verify $sf $out $names"
# shellcheck disable=SC2086  # empty names must expand to no argument
exec python3 tools/oracle_check.py "$sf" "$out" $names
