#!/bin/bash
# Full-registry bench with CPU-steal bracketing: samples /proc/stat
# steal jiffies before/after so a capture can be proven clean or
# contended from artifacts alone (the r11/r12 lesson: never commit a
# capture whose machine state is unknown).
set -e
cd /root/repo
read -r _ u1 n1 s1 i1 w1 irq1 sirq1 st1 _ < /proc/stat
t0=$(date +%s)
SPARK_GRAFT_SF_DIR=${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1} \
  sbt -batch "runMain graft.Bench" > /tmp/bench_run.log 2>&1 || true
t1=$(date +%s)
read -r _ u2 n2 s2 i2 w2 irq2 sirq2 st2 _ < /proc/stat
wall=$((t1 - t0))
steal=$((st2 - st1))
# jiffies -> seconds (USER_HZ=100), across 32 cpus
python3 - "$wall" "$steal" <<'EOF'
import sys, json
wall, steal = int(sys.argv[1]), int(sys.argv[2])
steal_s = steal / 100.0
pct = 100.0 * steal_s / (wall * 32) if wall else 0.0
try:
    d = json.load(open('target/bench.json'))
    print(f"bench total={d['value']:.1f}s queries={len(d['queries'])} "
          f"suspects={d.get('suspect')}")
except Exception as e:
    print('no bench.json:', e)
print(f"wall={wall}s steal={steal_s:.1f}s ({pct:.2f}% of 32-cpu time)")
EOF
