#!/usr/bin/env python3
"""Synthetic ~sf1 bench fixture (VERDICT r7 #5): extend the scaling-slope
study a full decade past the driver fixtures by DETERMINISTIC 10x
replication of sf0.1 with fresh keys. Bench-only — no DuckDB oracle runs
on it (the correctness gate stays on the driver fixtures); its sole job is
the sf0.01 -> sf0.1 -> sf1 slope table in BASELINE.md.

Replication model (replica r in 0..9; r=0 is the original bytes):
  * region/nation stay fixed — they are genuine fixed-cardinality
    dimensions at ANY scale factor (TPC-H keeps nation=25 from sf1 to
    sf100k), and replicating them would corrupt the star-join shape.
  * every fact/dim key shifts by r * stride (stride = max(key)+1 per key
    domain), applied consistently to foreign keys (o_custkey moves with
    c_custkey, l_orderkey with o_orderkey, ...) so each replica is a
    self-consistent disjoint sub-universe — referential integrity holds
    corpus-wide.
  * documents.text gets a per-replica word suffix (every token w -> wq<r>;
    ALPHANUMERIC on purpose — a punctuation salt would inject regex-class
    matches the pristine driver text lacks and corrupt the slope of every
    normalization query with data-dependent per-char cost)
    and n_chars is recomputed: verbatim text copies would make every doc a
    10-way exact duplicate and blow the near-dup pair graph up
    quadratically — organic sf1 corpora are mostly UNIQUE text, and the
    word suffix makes replica shingle/minhash spaces disjoint while
    preserving token counts and length distributions.
  * embeddings rotate dimensions cyclically by r (norm-preserving, so the
    unit-norm contract holds; replicas land in distinct regions instead of
    stacking 10 identical vectors on every point, which would degenerate
    the kNN/mutual-NN graphs).
  * timestamps/values are kept verbatim: 10x events per hour is exactly
    what organic 10x growth looks like; pyarrow-level rewrite preserves
    the parquet schema bit-exactly (the reshard.py precedent).

Layout: dst/<table>.parquet/part-<r>.parquet (multi-file, like the
8-shard fixture — Spark and DuckDB read the directory via glob).

Usage: python3 tools/make_sf1.py [srcDir] [dstDir] [replicas]
Driver-side python tooling (pyarrow/numpy) — NOT part of the Spark library.
"""
import sys, os
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pyarrow.compute as pc

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "target/fixtures/sf1"
R = int(sys.argv[3]) if len(sys.argv) > 3 else 10
SLICES = int(sys.argv[4]) if len(sys.argv) > 4 else 4  # part files per replica

FIXED = ["region", "nation"]
# table -> {column: stride-domain}; strides computed from the source data
KEYED = {
    "customer":   {"c_custkey": "cust"},
    "supplier":   {"s_suppkey": "supp"},
    "part":       {"p_partkey": "part"},
    "orders":     {"o_orderkey": "ord", "o_custkey": "cust"},
    "lineitem":   {"l_orderkey": "ord", "l_partkey": "part", "l_suppkey": "supp"},
    "events":     {"event_id": "ev", "user_id": "user"},
    "documents":  {"doc_id": "doc"},
    "embeddings": {"vec_id": "vec"},
}
DOMAIN_OF = {"cust": ("customer", "c_custkey"), "supp": ("supplier", "s_suppkey"),
             "part": ("part", "p_partkey"), "ord": ("orders", "o_orderkey"),
             "ev": ("events", "event_id"), "user": ("events", "user_id"),
             "doc": ("documents", "doc_id"), "vec": ("embeddings", "vec_id")}

src_tables = {t: pq.read_table(f"{SRC}/{t}.parquet") for t in list(KEYED) + FIXED}
stride = {d: pc.max(src_tables[t].column(c)).as_py() + 1
          for d, (t, c) in DOMAIN_OF.items()}
print("strides:", stride)

for t in FIXED:
    outdir = f"{DST}/{t}.parquet"
    os.makedirs(outdir, exist_ok=True)
    pq.write_table(src_tables[t], f"{outdir}/part-00000.parquet")
    print(f"{t}: fixed dimension, copied once")

for t, keys in KEYED.items():
    tbl = src_tables[t]
    outdir = f"{DST}/{t}.parquet"
    os.makedirs(outdir, exist_ok=True)
    for r in range(R):
        cols = {}
        for f in tbl.schema:
            col = tbl.column(f.name)
            if f.name in keys:
                col = pc.add(col, r * stride[keys[f.name]]).cast(f.type)
            elif t == "documents" and f.name == "text" and r > 0:
                suf = f"q{r}"
                col = pc.binary_join_element_wise(
                    pc.replace_substring(col, " ", suf + " "), "", suf)
            elif t == "embeddings" and f.name == "embedding" and r > 0:
                flat = col.combine_chunks().flatten().to_numpy(zero_copy_only=False)
                dims = len(flat) // tbl.num_rows
                rot = np.roll(flat.reshape(tbl.num_rows, dims), r, axis=1).ravel()
                col = pa.FixedSizeListArray.from_arrays(
                    pa.array(rot, type=f.type.value_type), dims).cast(f.type)
            cols[f.name] = col
        if t == "documents":
            cols["n_chars"] = pc.utf8_length(cols["text"]).cast(
                tbl.schema.field("n_chars").type)
        out = pa.table([cols[f.name] for f in tbl.schema], schema=tbl.schema)
        # SLICES part files per replica: enough physical splits that a
        # maxPartitionBytes-sized scan fans out to real parallelism (a
        # single part per replica bin-packs into one task and serializes
        # CPU-heavy text scans — the artifact the slope study exists to rule
        # out, not to measure)
        import math
        per = math.ceil(out.num_rows / SLICES)
        for sl in range(SLICES):
            chunk = out.slice(sl * per, per)
            if chunk.num_rows:
                pq.write_table(chunk, f"{outdir}/part-{r:05d}-{sl}.parquet")
    print(f"{t}: {tbl.num_rows} rows x {R} replicas x {SLICES} slices -> {outdir}")
print(f"done -> {DST}")
