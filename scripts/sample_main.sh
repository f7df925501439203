#!/usr/bin/env bash
# Sample the "main" thread of a JVM with jstack and aggregate the deepest
# interesting frames — driver-side planning cost shows up here (guide §7.3).
# Usage: scripts/sample_main.sh <pid> <seconds> [thread-pattern]
# Output: frame histogram on stdout (top frames of the matched thread).
set -euo pipefail
PID=$1; SECS=${2:-20}; PAT=${3:-'"main"'}
END=$((SECS * 10))
TMP=$(mktemp -d)
for i in $(seq 1 "$END"); do
  jstack "$PID" 2>/dev/null | awk -v pat="$PAT" '
    $0 ~ pat {grab=1}
    grab && /^$/ {grab=0}
    grab && /^\tat / {print $2}
  ' >> "$TMP/frames.txt" || true
  sleep 0.1
done
echo "== top frames ($(wc -l < "$TMP/frames.txt") samples x depth) =="
sort "$TMP/frames.txt" | uniq -c | sort -rn | head -40
rm -rf "$TMP"
