#!/bin/bash
# Round-16 closing evidence battery. ORDERING (VERDICT r15 #1): the sf1
# FULL-surface oracle gate runs FIRST of all artifacts — round 15's close
# was cut off mid-run and truncated exactly this file, so the most
# expensive, least-reproducible gate now writes before anything else; a
# timeout then truncates a cheap re-runnable artifact, not the gate.
# Sequential on purpose — benches and gates must not contend (the
# round-10 ambient-drift lesson, re-learned round 16 when a concurrent
# test JVM broke a plan gate).
set -x
cd /root/repo

# the FULL oracle surface, derived from the engine itself (360 keys r16)
SPARK_GRAFT_CPUS=16 sbt -batch "runMain graft.Verify /root/testdata/sf0.001 /tmp/vr16_sf0001" 2>&1 | grep "\[verify\]"
SUBSET=$(python3 -c "import json; print(','.join(sorted(json.load(open('/tmp/vr16_sf0001/oracle_sql.json')))))")
echo "$SUBSET" | tr ',' '\n' > tools/sf1_subset_keys.txt.tmp && \
  paste -sd, tools/sf1_subset_keys.txt.tmp > tools/sf1_subset_keys.txt && rm tools/sf1_subset_keys.txt.tmp

# 1. sf1 gate FIRST: the FULL oracle surface, self-contained run
SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Verify target/fixtures/sf1 /tmp/vr16_sf1 $SUBSET" 2>&1 | grep "\[verify\]"
{ echo "# round-16 sf1 oracle gate = the FULL oracle surface (self-contained):"
  echo "# $SUBSET"
  python3 tools/preflight.py target/fixtures/sf1 /tmp/vr16_sf1 "$SUBSET" 2>&1
} > bench/PREFLIGHT_r16_sf1.txt
tail -1 bench/PREFLIGHT_r16_sf1.txt

# 2. the four cheaper layouts
python3 tools/preflight.py /root/testdata/sf0.001 /tmp/vr16_sf0001 > bench/PREFLIGHT_r16_sf0.001.txt 2>&1
tail -1 bench/PREFLIGHT_r16_sf0.001.txt

SPARK_GRAFT_CPUS=16 sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/vr16_sf001" 2>&1 | grep "\[verify\]"
python3 tools/preflight.py /root/testdata/sf0.01 /tmp/vr16_sf001 > bench/PREFLIGHT_r16_sf0.01.txt 2>&1
tail -1 bench/PREFLIGHT_r16_sf0.01.txt

SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Verify /root/testdata/sf0.1 /tmp/vr16_sf01" 2>&1 | grep "\[verify\]"
python3 tools/preflight.py /root/testdata/sf0.1 /tmp/vr16_sf01 > bench/PREFLIGHT_r16_sf0.1.txt 2>&1
tail -1 bench/PREFLIGHT_r16_sf0.1.txt

SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Verify target/fixtures/sf0.1x8 /tmp/vr16_x8" 2>&1 | grep "\[verify\]"
python3 tools/preflight.py target/fixtures/sf0.1x8 /tmp/vr16_x8 > bench/PREFLIGHT_r16_sf0.1x8.txt 2>&1
tail -1 bench/PREFLIGHT_r16_sf0.1x8.txt

echo GATES_DONE

# 3. benches AFTER all gates, quiet window, warm-median3-mad5sub protocol
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Bench" 2>/dev/null | grep '"metric"' > /dev/null
cp BENCH.json bench/BENCH_r16_sf0.01.json
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Bench" 2>/dev/null | grep '"metric"' > /dev/null
cp BENCH.json bench/BENCH_r16_sf0.1.json
SPARK_GRAFT_SF_DIR=target/fixtures/sf0.1x8 SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Bench" 2>/dev/null | grep '"metric"' > /dev/null
cp BENCH.json bench/BENCH_r16_sf0.1x8.json
SPARK_GRAFT_SF_DIR=target/fixtures/sf1 SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Bench" 2>/dev/null | grep '"metric"' > /dev/null
cp BENCH.json bench/BENCH_r16_sf1.json

echo BENCH_DONE
