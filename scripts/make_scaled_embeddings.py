#!/usr/bin/env python
"""Embeddings-only scaled replica — the ANN-funnel evidence corpus.

Reuses make_scaled.py's replication transforms (vec_id stride offsets +
deterministic per-replica sign flips: norms and within-replica geometry
preserved, cross-replica cosines decorrelated) but writes ONLY
embeddings.parquet, so a 600k-vector corpus for the funnel bench costs
~150 MB instead of a full 5 GB sf-dir replica.

Usage: python scripts/make_scaled_embeddings.py K SRC_DIR OUT_DIR
e.g.   python scripts/make_scaled_embeddings.py 30 .scale/sf1 .scale/emb600k
"""

from __future__ import annotations

import os
import sys

import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from make_scaled import shift_ids, transform_embeddings  # noqa: E402


def main() -> None:
    k = int(sys.argv[1])
    src, out = sys.argv[2], sys.argv[3]
    os.makedirs(out, exist_ok=True)
    base = pq.read_table(f"{src}/embeddings.parquet")
    with pq.ParquetWriter(f"{out}/embeddings.parquet", base.schema) as w:
        for i in range(k):
            tbl = shift_ids(base, "embeddings", i) if i else base
            if i:
                tbl = transform_embeddings(tbl, i)
            w.write_table(tbl)
    print(f"embeddings: {len(base)} x {k} = {len(base) * k} rows -> {out}")


if __name__ == "__main__":
    main()
