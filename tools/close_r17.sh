#!/bin/bash
# Round-17 OPTIMIZATION close battery: full oracle surface at every layout
# after the optimization changes, then benches in a quiet window.
set -x
cd /root/repo

SPARK_GRAFT_CPUS=16 sbt -batch "runMain graft.Verify /root/testdata/sf0.001 /tmp/vr17_sf0001" 2>&1 | grep "\[verify\]"
python3 tools/preflight.py /root/testdata/sf0.001 /tmp/vr17_sf0001 > bench/PREFLIGHT_r17_sf0.001.txt 2>&1
tail -1 bench/PREFLIGHT_r17_sf0.001.txt

SPARK_GRAFT_CPUS=16 sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/vr17_sf001" 2>&1 | grep "\[verify\]"
python3 tools/preflight.py /root/testdata/sf0.01 /tmp/vr17_sf001 > bench/PREFLIGHT_r17_sf0.01.txt 2>&1
tail -1 bench/PREFLIGHT_r17_sf0.01.txt

SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Verify /root/testdata/sf0.1 /tmp/vr17_sf01" 2>&1 | grep "\[verify\]"
python3 tools/preflight.py /root/testdata/sf0.1 /tmp/vr17_sf01 > bench/PREFLIGHT_r17_sf0.1.txt 2>&1
tail -1 bench/PREFLIGHT_r17_sf0.1.txt

python3 tools/reshard.py /root/testdata/sf0.1 target/fixtures/sf0.1x8 8
SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Verify target/fixtures/sf0.1x8 /tmp/vr17_x8" 2>&1 | grep "\[verify\]"
python3 tools/preflight.py target/fixtures/sf0.1x8 /tmp/vr17_x8 > bench/PREFLIGHT_r17_sf0.1x8.txt 2>&1
tail -1 bench/PREFLIGHT_r17_sf0.1x8.txt

echo GATES_DONE
