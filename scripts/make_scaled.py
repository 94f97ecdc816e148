#!/usr/bin/env python
"""Generate scaled-up benchmark data by replicating a source sf dir K times
with key offsets (replica 0 = the original rows, untouched).

Purpose: the sf-scaling evidence run (PERFORMANCE.md) — Spark's fixed
per-query overhead amortizes with data volume while single-node engines
scale linearly; this produces the data to measure that crossover on the
SAME 15 headline queries + DuckDB oracles. Output lives under
``.scale/`` (gitignored), never under /root/testdata (read-only).

Replication design (per replica i >= 1):
* every id column shifts by ``i * STRIDE`` so replicas never collide and
  referential joins (orders->customer, lineitem->orders/part/supplier,
  events.user_id->custkey) stay consistent within a replica;
* STRIDE is divisible by 20 so ``event_id % 20`` sampling keeps the same
  selectivity on every replica;
* document text gets a per-replica word suffix ("wordxI") — within-replica
  shingle structure (and thus dup/near-dup relationships) is identical to
  the base corpus, cross-replica overlap is zero, so dedup workloads scale
  linearly instead of quadratically-by-construction;
* embeddings get a deterministic per-replica sign-flip pattern — norms,
  within-replica pairwise cosines and cluster geometry are preserved
  exactly, cross-replica cosines decorrelate;
* region/nation are bounded real-world dims and stay as-is.

Usage: python scripts/make_scaled.py K SRC_DIR OUT_DIR
e.g.   python scripts/make_scaled.py 10 /root/testdata/sf0.1 .scale/sf1
"""

from __future__ import annotations

import hashlib
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

STRIDE = 10_000_000  # divisible by 20: preserves event_id % 20 sampling

ID_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY_TABLES = ["region", "nation"]


def shift_ids(tbl: pa.Table, name: str, i: int) -> pa.Table:
    for col in ID_COLS.get(name, []):
        idx = tbl.column_names.index(col)
        shifted = pc.add(tbl.column(col), pa.scalar(i * STRIDE, pa.int64()))
        tbl = tbl.set_column(idx, col, shifted.cast(tbl.schema.field(col).type))
    return tbl


def transform_documents(tbl: pa.Table, i: int) -> pa.Table:
    texts = tbl.column("text").to_pylist()
    suffix = f"x{i}"
    new_texts = [
        " ".join(w + suffix for w in t.split()) if t is not None else None
        for t in texts
    ]
    tbl = tbl.set_column(
        tbl.column_names.index("text"), "text", pa.array(new_texts, pa.string())
    )
    n_chars = pa.array(
        [len(t) if t is not None else None for t in new_texts], pa.int64()
    )
    return tbl.set_column(tbl.column_names.index("n_chars"), "n_chars", n_chars)


def transform_embeddings(tbl: pa.Table, i: int) -> pa.Table:
    col = tbl.column("embedding").combine_chunks()
    flat = np.asarray(
        col.chunk(0).flatten() if isinstance(col, pa.ChunkedArray) else col.flatten()
    ).astype(np.float32)
    dim = len(flat) // len(tbl)
    # deterministic per-(replica, component) sign pattern
    signs = np.array(
        [
            1.0 if int(hashlib.md5(f"flip{i}_{j}".encode()).hexdigest()[:2], 16) % 2 == 0 else -1.0
            for j in range(dim)
        ],
        dtype=np.float32,
    )
    mat = flat.reshape(-1, dim) * signs
    elem_type = tbl.schema.field("embedding").type.value_type
    new_col = pa.FixedSizeListArray.from_arrays(
        pa.array(mat.ravel(), elem_type), dim
    ).cast(tbl.schema.field("embedding").type)
    return tbl.set_column(tbl.column_names.index("embedding"), "embedding", new_col)


def main() -> None:
    k = int(sys.argv[1])
    src, out = sys.argv[2], sys.argv[3]
    os.makedirs(out, exist_ok=True)
    for name in COPY_TABLES:
        tbl = pq.read_table(f"{src}/{name}.parquet")
        pq.write_table(tbl, f"{out}/{name}.parquet")
        print(f"{name}: copied {len(tbl)} rows")
    for name in ID_COLS:
        base = pq.read_table(f"{src}/{name}.parquet")
        with pq.ParquetWriter(f"{out}/{name}.parquet", base.schema) as w:
            for i in range(k):
                tbl = shift_ids(base, name, i) if i else base
                if i and name == "documents":
                    tbl = transform_documents(tbl, i)
                if i and name == "embeddings":
                    tbl = transform_embeddings(tbl, i)
                w.write_table(tbl)
        print(f"{name}: {len(base)} x {k} = {len(base) * k} rows")


if __name__ == "__main__":
    main()
