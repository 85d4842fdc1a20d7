#!/bin/bash
# Dev tool: run a ScalingBench leg and sample executor stack tops.
# Usage: tools/profile_bench.sh <pages> <density> <steps> <cores>
set -u
PAGES=${1:-8000000}; DENSITY=${2:-8}; STEPS=${3:-10}; CORES=${4:-32}
cd /root/repo
env SCALING_FULL=0 SPARK_DRIVER_MEM=64g sbt -batch \
  "runMain graft.bench.ScalingBench $PAGES $DENSITY $STEPS $CORES $CORES" \
  > /tmp/profbench.log 2>&1 &
SBT_PID=$!
sleep 130
PID=$(ps aux | grep [j]ava | grep sbt-args | sort -k3 -rn | head -1 | awk '{print $2}')
echo "app pid=$PID" > /tmp/tops_summary.txt
rm -f /tmp/tops.txt
for i in $(seq 1 12); do
  jstack "$PID" 2>/dev/null | python3 -c "
import sys
lines = sys.stdin.read().splitlines()
i = 0
while i < len(lines):
    if lines[i].startswith('\"Executor task launch worker'):
        j = i + 1
        while j < len(lines) and lines[j].strip():
            s = lines[j].strip()
            if s.startswith('at '):
                print(s[3:])
                break
            j += 1
    i += 1
" >> /tmp/tops.txt
  sleep 7
done
sort /tmp/tops.txt | uniq -c | sort -rn | head -25 >> /tmp/tops_summary.txt
wait $SBT_PID
grep SCALING /tmp/profbench.log | tail -1 >> /tmp/tops_summary.txt
