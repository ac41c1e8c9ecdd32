#!/bin/bash
# Dev loop: run graft.Verify via the warm sbt tmux session, wait for the
# oracle_sql.json (written last), then cross-check against DuckDB.
# Usage: tools/verify_check.sh <sfDir> <outDir> [query ...]
set -u
SF="$1"; OUT="$2"; shift 2
rm -rf "$OUT"
tmux send-keys -t sbt "runMain graft.Verify $SF $OUT $*" Enter
for i in $(seq 1 600); do
  [ -f "$OUT/oracle_sql.json" ] && break
  sleep 2
done
if [ ! -f "$OUT/oracle_sql.json" ]; then
  echo "TIMEOUT waiting for Verify"; tmux capture-pane -t sbt -p | tail -30; exit 2
fi
sleep 1
python3 "$(dirname "$0")/check_oracle.py" "$SF" "$OUT" "$@"
