#!/bin/bash
# Round-13 four-layout bench (warm-median3, quiet window). Run AFTER
# close_r13.sh — benches and gates must not contend.
set -x
cd /root/repo
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" 2>/dev/null | grep '"metric"' | sed 's/^\[info\] //' > bench/BENCH_r13_sf0.1.json
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 sbt -batch "runMain graft.Bench" 2>/dev/null | grep '"metric"' | sed 's/^\[info\] //' > bench/BENCH_r13_sf0.01.json
SPARK_GRAFT_SF_DIR=target/fixtures/sf0.1x8 sbt -batch "runMain graft.Bench" 2>/dev/null | grep '"metric"' | sed 's/^\[info\] //' > bench/BENCH_r13_sf0.1x8.json
SPARK_GRAFT_SF_DIR=target/fixtures/sf1 sbt -batch "runMain graft.Bench" 2>/dev/null | grep '"metric"' | sed 's/^\[info\] //' > bench/BENCH_r13_sf1.json
echo BENCHES_DONE
