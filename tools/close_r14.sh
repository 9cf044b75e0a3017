#!/bin/bash
# Round-14 closing evidence battery: tri-SF + 8-shard full preflights,
# the sf1 FULL-surface oracle gate (349 keys — the complete oracle
# surface, list in tools/sf1_subset_keys.txt; ADVICE r13 #2: this run is
# SELF-CONTAINED, covering every key including the round-13 late
# additions and the round-14 batch), then the four-layout bench.
# Sequential on purpose — benches and gates must not contend (the
# round-10 ambient-drift lesson).
set -x
cd /root/repo

SPARK_GRAFT_CPUS=16 sbt -batch "runMain graft.Verify /root/testdata/sf0.001 /tmp/vr14_sf0001" 2>&1 | grep "\[verify\]"
python3 tools/preflight.py /root/testdata/sf0.001 /tmp/vr14_sf0001 > bench/PREFLIGHT_r14_sf0.001.txt 2>&1
tail -1 bench/PREFLIGHT_r14_sf0.001.txt

SPARK_GRAFT_CPUS=16 sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/vr14_sf001" 2>&1 | grep "\[verify\]"
python3 tools/preflight.py /root/testdata/sf0.01 /tmp/vr14_sf001 > bench/PREFLIGHT_r14_sf0.01.txt 2>&1
tail -1 bench/PREFLIGHT_r14_sf0.01.txt

SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Verify /root/testdata/sf0.1 /tmp/vr14_sf01" 2>&1 | grep "\[verify\]"
python3 tools/preflight.py /root/testdata/sf0.1 /tmp/vr14_sf01 > bench/PREFLIGHT_r14_sf0.1.txt 2>&1
tail -1 bench/PREFLIGHT_r14_sf0.1.txt

SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Verify target/fixtures/sf0.1x8 /tmp/vr14_x8" 2>&1 | grep "\[verify\]"
python3 tools/preflight.py target/fixtures/sf0.1x8 /tmp/vr14_x8 > bench/PREFLIGHT_r14_sf0.1x8.txt 2>&1
tail -1 bench/PREFLIGHT_r14_sf0.1x8.txt

# sf1 gate: the FULL oracle surface (349 keys, self-contained run)
SUBSET=$(cat tools/sf1_subset_keys.txt)
SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Verify target/fixtures/sf1 /tmp/vr14_sf1 $SUBSET" 2>&1 | grep "\[verify\]"
{ echo "# round-14 sf1 oracle gate = the FULL oracle surface (349 keys, self-contained):"
  echo "# $SUBSET"
  python3 tools/preflight.py target/fixtures/sf1 /tmp/vr14_sf1 "$SUBSET" 2>&1
} > bench/PREFLIGHT_r14_sf1.txt
tail -1 bench/PREFLIGHT_r14_sf1.txt

echo GATES_DONE

# benches AFTER gates, quiet window, warm-median3-mad5sub protocol
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Bench" 2>/dev/null | grep '"metric"' > /dev/null
cp BENCH.json bench/BENCH_r14_sf0.01.json
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Bench" 2>/dev/null | grep '"metric"' > /dev/null
cp BENCH.json bench/BENCH_r14_sf0.1.json
SPARK_GRAFT_SF_DIR=target/fixtures/sf0.1x8 SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Bench" 2>/dev/null | grep '"metric"' > /dev/null
cp BENCH.json bench/BENCH_r14_sf0.1x8.json
SPARK_GRAFT_SF_DIR=target/fixtures/sf1 SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Bench" 2>/dev/null | grep '"metric"' > /dev/null
cp BENCH.json bench/BENCH_r14_sf1.json

echo BENCH_DONE
