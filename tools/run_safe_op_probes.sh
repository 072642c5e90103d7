#!/bin/bash
# Sequential on-chip safe-op probe campaign: one FRESH process per op with
# a cool-down gap (a failing op poisons its client session; back-to-back
# probes wedge the tunnel — CLAUDE.md protocol).
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/safe_op_probes.log}
: > "$LOG"
for op in complex64 sort argsort top_k gather median reduce_window timing; do
  echo "=== $op $(date -u +%H:%M:%S) ===" >> "$LOG"
  PYTHONPATH="$PWD:${PYTHONPATH:-}" timeout 900 python tools/probe_safe_ops.py "$op" >> "$LOG" 2>&1
  sleep 20
done
echo "=== campaign done $(date -u +%H:%M:%S) ===" >> "$LOG"
