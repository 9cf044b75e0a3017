#!/usr/bin/env python3
"""Re-shard the single-file test tables into multiple parquet part files
(VERDICT r4 #6): the driver fixtures are one file per table, so local
benches never exercise multi-split scans, partitioned parquet footers, or
AQE coalescing over many input partitions — exactly the read path a
1000-executor cluster lives on. pyarrow row-group-level copy preserves the
schema bit-exactly (including the ns-precision events timestamps that
Spark-side rewrites would coerce).

Usage: python3 tools/reshard.py [srcDir] [dstDir] [nShards]
Layout: dst/<table>.parquet/part-<k>.parquet  (Spark and DuckDB both read
a directory of parts via glob).

Driver-side python tooling (pyarrow) — NOT part of the Spark library.
"""
import sys, os, math
import pyarrow.parquet as pq

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "target/fixtures/sf0.1x8"
N = int(sys.argv[3]) if len(sys.argv) > 3 else 8

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

for t in TABLES:
    src = f"{SRC}/{t}.parquet"
    tbl = pq.read_table(src)
    n = tbl.num_rows
    shards = min(N, max(1, n // 1000)) if n < N * 1000 else N
    outdir = f"{DST}/{t}.parquet"
    os.makedirs(outdir, exist_ok=True)
    per = math.ceil(n / shards)
    for k in range(shards):
        chunk = tbl.slice(k * per, per)
        if chunk.num_rows == 0:
            continue
        pq.write_table(chunk, f"{outdir}/part-{k:05d}.parquet")
    print(f"{t}: {n} rows -> {shards} shard(s)")
print(f"done -> {DST}")
