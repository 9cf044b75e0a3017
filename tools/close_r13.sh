#!/bin/bash
# Round-13 closing evidence battery: tri-SF + 8-shard full preflights,
# the sf1 FULL-surface oracle gate (338 keys — no longer a subset), then
# the four-layout bench. Sequential on purpose — benches and gates must
# not contend (the round-10 ambient-drift lesson).
set -x
cd /root/repo

SPARK_GRAFT_CPUS=16 sbt -batch "runMain graft.Verify /root/testdata/sf0.001 /tmp/vr13_sf0001" 2>&1 | grep "\[verify\]"
python3 tools/preflight.py /root/testdata/sf0.001 /tmp/vr13_sf0001 > bench/PREFLIGHT_r13_sf0.001.txt 2>&1
tail -1 bench/PREFLIGHT_r13_sf0.001.txt

SPARK_GRAFT_CPUS=16 sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/vr13_sf001" 2>&1 | grep "\[verify\]"
python3 tools/preflight.py /root/testdata/sf0.01 /tmp/vr13_sf001 > bench/PREFLIGHT_r13_sf0.01.txt 2>&1
tail -1 bench/PREFLIGHT_r13_sf0.01.txt

SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Verify /root/testdata/sf0.1 /tmp/vr13_sf01" 2>&1 | grep "\[verify\]"
python3 tools/preflight.py /root/testdata/sf0.1 /tmp/vr13_sf01 > bench/PREFLIGHT_r13_sf0.1.txt 2>&1
tail -1 bench/PREFLIGHT_r13_sf0.1.txt

SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Verify target/fixtures/sf0.1x8 /tmp/vr13_x8" 2>&1 | grep "\[verify\]"
python3 tools/preflight.py target/fixtures/sf0.1x8 /tmp/vr13_x8 > bench/PREFLIGHT_r13_sf0.1x8.txt 2>&1
tail -1 bench/PREFLIGHT_r13_sf0.1x8.txt

# sf1 gate: the FULL oracle surface (VERDICT r12 #4 — 139 -> 338 keys,
# i.e. every oracle-bearing key; list recorded in tools/sf1_subset_keys.txt)
SUBSET=$(cat tools/sf1_subset_keys.txt)
SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Verify target/fixtures/sf1 /tmp/vr13_sf1 $SUBSET" 2>&1 | grep "\[verify\]"
{ echo "# round-13 sf1 oracle gate = the FULL oracle surface (338 keys, recorded):"
  echo "# $SUBSET"
  python3 tools/preflight.py target/fixtures/sf1 /tmp/vr13_sf1 "$SUBSET" 2>&1
} > bench/PREFLIGHT_r13_sf1_subset.txt
tail -1 bench/PREFLIGHT_r13_sf1_subset.txt

echo GATES_DONE
