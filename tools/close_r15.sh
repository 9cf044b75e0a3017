#!/bin/bash
# Round-15 closing evidence battery (VERDICT r14 #4/#8): FIVE full-surface
# preflights — tri-SF + 8-shard + sf1 — every one at the complete oracle
# surface (356 keys = 363 registry − 7 declared no-oracle exclusions; the
# key list is derived from the run's own oracle_sql.json and recorded in
# each sf1/sf0.001 header), then the four-layout bench. Sequential on
# purpose — benches and gates must not contend (the round-10 ambient
# lesson).
set -x
cd /root/repo

SPARK_GRAFT_CPUS=16 sbt -batch "runMain graft.Verify /root/testdata/sf0.001 /tmp/vr15_sf0001" 2>&1 | grep "\[verify\]"
# the full oracle surface, from the artifact the oracle run itself wrote
SUBSET=$(python3 -c "import json;print(','.join(sorted(json.load(open('/tmp/vr15_sf0001/oracle_sql.json')).keys())))")
{ echo "# round-15 sf0.001 oracle gate = the FULL oracle surface ($(echo $SUBSET | tr ',' '\n' | wc -l) keys, self-contained):"
  echo "# $SUBSET"
  python3 tools/preflight.py /root/testdata/sf0.001 /tmp/vr15_sf0001 2>&1
} > bench/PREFLIGHT_r15_sf0.001.txt
tail -1 bench/PREFLIGHT_r15_sf0.001.txt

SPARK_GRAFT_CPUS=16 sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/vr15_sf001" 2>&1 | grep "\[verify\]"
python3 tools/preflight.py /root/testdata/sf0.01 /tmp/vr15_sf001 > bench/PREFLIGHT_r15_sf0.01.txt 2>&1
tail -1 bench/PREFLIGHT_r15_sf0.01.txt

SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Verify /root/testdata/sf0.1 /tmp/vr15_sf01" 2>&1 | grep "\[verify\]"
python3 tools/preflight.py /root/testdata/sf0.1 /tmp/vr15_sf01 > bench/PREFLIGHT_r15_sf0.1.txt 2>&1
tail -1 bench/PREFLIGHT_r15_sf0.1.txt

SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Verify target/fixtures/sf0.1x8 /tmp/vr15_x8" 2>&1 | grep "\[verify\]"
python3 tools/preflight.py target/fixtures/sf0.1x8 /tmp/vr15_x8 > bench/PREFLIGHT_r15_sf0.1x8.txt 2>&1
tail -1 bench/PREFLIGHT_r15_sf0.1x8.txt

# sf1 gate: the FULL oracle surface, self-contained
SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Verify target/fixtures/sf1 /tmp/vr15_sf1 $SUBSET" 2>&1 | grep "\[verify\]"
{ echo "# round-15 sf1 oracle gate = the FULL oracle surface ($(echo $SUBSET | tr ',' '\n' | wc -l) keys, self-contained):"
  echo "# $SUBSET"
  python3 tools/preflight.py target/fixtures/sf1 /tmp/vr15_sf1 "$SUBSET" 2>&1
} > bench/PREFLIGHT_r15_sf1.txt
tail -1 bench/PREFLIGHT_r15_sf1.txt

# refresh the recorded sf1 key list for future self-contained runs
echo "$SUBSET" > tools/sf1_subset_keys.txt

echo GATES_DONE

# benches AFTER gates, quiet window, warm-median3-mad5sub protocol
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Bench" 2>/dev/null | grep '"metric"' > /dev/null
cp BENCH.json bench/BENCH_r15_sf0.01.json
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Bench" 2>/dev/null | grep '"metric"' > /dev/null
cp BENCH.json bench/BENCH_r15_sf0.1.json
SPARK_GRAFT_SF_DIR=target/fixtures/sf0.1x8 SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Bench" 2>/dev/null | grep '"metric"' > /dev/null
cp BENCH.json bench/BENCH_r15_sf0.1x8.json
SPARK_GRAFT_SF_DIR=target/fixtures/sf1 SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Bench" 2>/dev/null | grep '"metric"' > /dev/null
cp BENCH.json bench/BENCH_r15_sf1.json

echo BENCH_DONE
