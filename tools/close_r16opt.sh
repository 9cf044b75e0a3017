#!/bin/bash
# Round-16 OPTIMIZATION close battery: re-run the full oracle surface at
# every available layout AFTER the optimization changes (the pre-existing
# PREFLIGHT_r16_* archives were taken before them and would be stale
# claims). Gates first, x8 reshard included; benches are run separately in
# a quiet window (the round-10 contention lesson).
set -x
cd /root/repo

SPARK_GRAFT_CPUS=16 sbt -batch "runMain graft.Verify /root/testdata/sf0.001 /tmp/vr16o_sf0001" 2>&1 | grep "\[verify\]"
python3 tools/preflight.py /root/testdata/sf0.001 /tmp/vr16o_sf0001 > bench/PREFLIGHT_r16opt_sf0.001.txt 2>&1
tail -1 bench/PREFLIGHT_r16opt_sf0.001.txt

SPARK_GRAFT_CPUS=16 sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/vr16o_sf001" 2>&1 | grep "\[verify\]"
python3 tools/preflight.py /root/testdata/sf0.01 /tmp/vr16o_sf001 > bench/PREFLIGHT_r16opt_sf0.01.txt 2>&1
tail -1 bench/PREFLIGHT_r16opt_sf0.01.txt

SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Verify /root/testdata/sf0.1 /tmp/vr16o_sf01" 2>&1 | grep "\[verify\]"
python3 tools/preflight.py /root/testdata/sf0.1 /tmp/vr16o_sf01 > bench/PREFLIGHT_r16opt_sf0.1.txt 2>&1
tail -1 bench/PREFLIGHT_r16opt_sf0.1.txt

# 8-shard layout: reshard sf0.1 into target/fixtures/sf0.1x8 and gate there
python3 tools/reshard.py /root/testdata/sf0.1 target/fixtures/sf0.1x8 8
SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Verify target/fixtures/sf0.1x8 /tmp/vr16o_x8" 2>&1 | grep "\[verify\]"
python3 tools/preflight.py target/fixtures/sf0.1x8 /tmp/vr16o_x8 > bench/PREFLIGHT_r16opt_sf0.1x8.txt 2>&1
tail -1 bench/PREFLIGHT_r16opt_sf0.1x8.txt

echo GATES_DONE
