#!/usr/bin/env python3
"""Deterministic scale-up of the driver's sf0.1 fixture for stress sweeps.

The driver ships sf{0.001,0.01,0.1} (read-only); the VERDICT r4 top item
asks for an sf1.0 (10×) stress run to back the "scales" docstring claims
with measured per-query scaling. No external data and no RNG: each output
table is K deterministic transforms of the sf0.1 original, built so the
WORKLOAD SHAPE scales linearly instead of degenerately:

- every key space (doc_id, vec_id, event_id, user_id, *keys) shifts by
  r * 10_000_000 per replica r — disjoint ranges, joins stay consistent
  within a replica, group cardinalities scale ×K with per-group work
  unchanged (users, conversations, orders);
- document TEXT gets a per-replica alphabet rotation (a→b→c… by r, case
  preserved, digits/punctuation fixed): lengths, token boundaries and
  frequency shape are identical per replica, but vocabularies are
  disjoint — so dedup/minhash/vocab pair structure is ×K, NOT ×K² (naive
  replication would make every doc a 10-way exact dup and measure a pair
  explosion, not scaling);
- embeddings roll by r positions (norm-preserving, decorrelated for the
  iid-ish synthetic vectors) so ANN bucket occupancy grows ×K the way a
  real 10× corpus would;
- nation/region stay fixed (TPC-H semantics: dims below the broadcast
  threshold do not scale);
- events keep their time window (×K density — the "same week, bigger
  fleet" shape), timestamps untouched.

Output lands under /tmp (regenerable, never committed); the directory is
named sf<factor/10> so sf_of_dir() scales the transcript table to match
(sf1.0 → 12M generated turns).

Usage: python scripts/make_sf.py [K] [out_root]   (default K=10)
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
OFF = 10_000_000  # per-replica key shift, above every sf0.1 key range


def _rot_table(r: int) -> bytes:
    t = bytearray(range(256))
    for base in (ord("a"), ord("A")):
        for i in range(26):
            t[base + i] = base + (i + r) % 26
    return bytes(t)


def _rotate_text(col: pa.ChunkedArray, r: int) -> pa.Array:
    if r == 0:
        return col.combine_chunks()
    tbl = _rot_table(r)
    return pa.array([None if v is None else v.translate(tbl)
                     for v in col.to_pylist()], pa.string())


def _shift(col, r, typ=pa.int64()):
    return pc.add(col, pa.scalar(r * OFF, typ)).cast(typ)


def _roll_embeddings(col: pa.ChunkedArray, r: int) -> pa.Array:
    arr = col.combine_chunks()
    if r == 0:
        return arr
    flat = arr.flatten().to_numpy(zero_copy_only=False)
    offs = np.asarray(arr.offsets)
    widths = np.diff(offs)
    assert (widths == widths[0]).all(), "ragged embeddings"
    mat = flat.reshape(len(arr), widths[0])
    return pa.FixedSizeListArray.from_arrays(
        pa.array(np.roll(mat, r, axis=1).ravel(), pa.float32()),
        int(widths[0])).cast(pa.list_(pa.float32()))


def replica(name: str, t: pa.Table, r: int) -> pa.Table:
    c = {n: t.column(n) for n in t.column_names}
    if name == "documents":
        c["doc_id"] = _shift(c["doc_id"], r)
        c["text"] = _rotate_text(c["text"], r)
    elif name == "embeddings":
        c["vec_id"] = _shift(c["vec_id"], r)
        c["embedding"] = _roll_embeddings(c["embedding"], r)
    elif name == "events":
        c["event_id"] = _shift(c["event_id"], r)
        c["user_id"] = _shift(c["user_id"], r)
    elif name == "orders":
        c["o_orderkey"] = _shift(c["o_orderkey"], r)
        c["o_custkey"] = _shift(c["o_custkey"], r)
    elif name == "lineitem":
        c["l_orderkey"] = _shift(c["l_orderkey"], r)
        c["l_partkey"] = _shift(c["l_partkey"], r)
        c["l_suppkey"] = _shift(c["l_suppkey"], r)
    elif name == "customer":
        c["c_custkey"] = _shift(c["c_custkey"], r)
    elif name == "supplier":
        c["s_suppkey"] = _shift(c["s_suppkey"], r)
    elif name == "part":
        c["p_partkey"] = _shift(c["p_partkey"], r)
    return pa.table(c)


FILES_PER_REPLICA = {"events": 4, "lineitem": 8, "orders": 2,
                     "documents": 2, "customer": 1, "part": 1}


def main() -> int:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_root = sys.argv[2] if len(sys.argv) > 2 else "/tmp/spark_graft_testdata"
    out = os.path.join(out_root, f"sf{k / 10:.1f}")
    marker = os.path.join(out, f"_GENERATED_{k}")
    if os.path.exists(marker):
        print(out)
        return 0
    os.makedirs(out, exist_ok=True)
    for name in ("region", "nation", "customer", "supplier", "part",
                 "orders", "lineitem", "events", "documents", "embeddings"):
        src = pq.read_table(os.path.join(SRC, f"{name}.parquet"))
        dst = os.path.join(out, f"{name}.parquet")
        if name in ("region", "nation"):          # dims stay fixed
            pq.write_table(src, dst)
            continue
        os.makedirs(dst, exist_ok=True)
        nf = FILES_PER_REPLICA.get(name, 1)
        for r in range(k):
            rt = replica(name, src, r)
            step = (len(rt) + nf - 1) // nf
            for j in range(nf):
                part = rt.slice(j * step, step)
                pq.write_table(
                    part, os.path.join(dst, f"part-r{r:02d}-{j}.parquet"))
        print(f"{name}: {len(src) * k} rows, {k * nf} files")
    open(marker, "w").close()
    print(out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
