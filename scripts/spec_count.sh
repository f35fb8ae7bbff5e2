#!/usr/bin/env bash
# Derive the headline spec count from sbt's own summary — the same
# derive-from-tooling discipline as CountQueries (README/COVERAGE must
# quote THIS output, never a hand count).
#
# Usage: scripts/spec_count.sh [path-to-sbt-test-log]
#   With no argument, runs `sbt test` itself (slow) and parses the live
#   output. With an argument, parses an existing log instead.
set -euo pipefail
log="${1:-}"
if [[ -z "$log" ]]; then
  log="$(mktemp)"
  (cd "$(dirname "$0")/.." && sbt test 2>&1 | tee "$log" >/dev/null) || true
fi
# ScalaTest summary line: "Tests: succeeded N, failed N, canceled N, ignored N, pending N"
grep -Eo 'Tests: succeeded [0-9]+, failed [0-9]+, canceled [0-9]+' "$log" | tail -1
grep -Eo 'Total number of tests run: [0-9]+' "$log" | tail -1
