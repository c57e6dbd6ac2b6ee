"""Deterministic corpus scaling for the sf1 rehearsal.

The 100 TB design claims (banded dedup joins, capped posting lists,
IVF probe discipline, degree-ordered triangles) are argued from plan
shape and plan-gate tests; this module makes them *measurable* by
manufacturing a factor-x corpus from the driver's own sf0.1 testdata
and letting ``bench_scale.py`` assert per-query wall-time growth stays
~linear in data (sub-linear in pairs).

Scaling model — replica blocks, not row duplication:

* Every fact table is replicated ``factor`` times with all key columns
  offset by ``k * (max_key + 1)`` per replica ``k``, foreign keys
  offset by the REFERENCED table's stride — so the join graph becomes
  ``factor`` disconnected copies of the original. Joins, aggregations
  and graph algorithms see exactly factor-x rows with the original
  key-distribution shape (skew included) per block.
* ``documents.text`` gets every whitespace token suffixed with ``~k``
  in replica ``k`` — within-replica duplicate/near-dup structure is
  preserved exactly (the same transformation applies to both members
  of a pair) while cross-replica shingle/char-n-gram similarity drops
  to zero. Duplicate RATE therefore stays constant as the corpus
  grows, which is the honest target shape: naive replication would
  instead make every doc a 10-way near-dup of itself and quadratically
  inflate the true pair count, drowning the measurement.
* ``embeddings.embedding`` is rotated by ``k`` positions (numpy roll):
  norm-preserving and within-replica cosine structure identical, so
  ANN/semantic-dedup behavior replicates per block while cross-replica
  vectors decorrelate. Seed centroids (``vec_id < K``) keep pointing
  at replica-0 originals because offsets only grow ids.
* Dimension tables (region, nation) are copied unchanged — dims don't
  scale with fact data, and nationkey references stay valid.
* Everything is a pure function of the source bytes: no RNG, no
  timestamps. A ``_SCALE_MANIFEST.json`` records the source file
  hashes + factor so repeated calls are idempotent and a regenerated
  source corpus forces a rebuild instead of silently mixing vintages.
"""

from __future__ import annotations

import hashlib
import json
import os

# (key columns to offset) per table; foreign keys name the table whose
# stride they follow. Tables absent here are copied unchanged.
_KEYS: dict[str, dict[str, str]] = {
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {
        "l_orderkey": "orders",
        "l_partkey": "part",
        "l_suppkey": "supplier",
    },
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
    "events": {"event_id": "events", "user_id": "events_user"},
}

# (table, column) whose max defines each stride.
_STRIDE_SOURCE: dict[str, tuple[str, str]] = {
    "customer": ("customer", "c_custkey"),
    "supplier": ("supplier", "s_suppkey"),
    "part": ("part", "p_partkey"),
    "orders": ("orders", "o_orderkey"),
    "documents": ("documents", "doc_id"),
    "embeddings": ("embeddings", "vec_id"),
    "events": ("events", "event_id"),
    "events_user": ("events", "user_id"),
}

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "documents",
    "embeddings",
    "events",
]


def _file_hashes(src_dir: str) -> dict[str, str]:
    out: dict[str, str] = {}
    for fname in sorted(os.listdir(src_dir)):
        if not fname.endswith(".parquet"):
            continue
        h = hashlib.md5()
        with open(os.path.join(src_dir, fname), "rb") as fh:
            for chunk in iter(lambda: fh.read(1 << 20), b""):
                h.update(chunk)
        out[fname[: -len(".parquet")]] = h.hexdigest()
    return out


def _suffix_tokens(texts, k: int):
    """Replica-k token transform: 'a b' -> 'a~k b~k'. Applied
    identically to every doc in the replica, so within-replica
    similarity is untouched while cross-replica shingles share
    nothing."""
    tag = f"~{k}"
    return [
        None if t is None else " ".join(tok + tag for tok in t.split(" "))
        for t in texts
    ]


def _scaled_replica(table: str, tbl, k: int, strides: dict[str, int]):
    """Replica k of one source table as a new pyarrow Table."""
    import numpy as np
    import pyarrow as pa

    if k == 0 and table not in ("documents",):
        return tbl
    cols = {name: tbl.column(name) for name in tbl.schema.names}
    for col, stride_of in _KEYS.get(table, {}).items():
        if k:
            arr = cols[col].to_numpy(zero_copy_only=False)
            cols[col] = pa.array(
                arr + k * strides[stride_of], type=tbl.schema.field(col).type
            )
    if table == "documents":
        texts = cols["text"].to_pylist()
        if k:
            texts = _suffix_tokens(texts, k)
            cols["text"] = pa.array(texts, pa.string())
        # n_chars tracks the transformed text (queries treat it as a
        # derived length column; a stale value would skew any
        # length-based quality heuristic at scale).
        cols["n_chars"] = pa.array(
            [None if t is None else len(t) for t in texts], pa.int64()
        )
    if table == "embeddings" and k:
        mat = np.array(cols["embedding"].to_pylist(), dtype=np.float32)
        rolled = np.roll(mat, k, axis=1)
        cols["embedding"] = pa.array(
            [row.tolist() for row in rolled],
            pa.list_(pa.float32()),
        )
    return pa.table(
        {n: cols[n] for n in tbl.schema.names}, schema=tbl.schema
    )


def scale_corpus(
    src_dir: str, dst_dir: str, factor: int, tables: list[str] | None = None
) -> dict:
    """Materialize a factor-x corpus at dst_dir; idempotent via the
    manifest (source hashes + factor + table list). Returns the
    manifest."""
    import pyarrow.parquet as pq

    tables = list(tables or TABLES)
    manifest = {
        "factor": factor,
        "tables": tables,
        "source": _file_hashes(src_dir),
    }
    mpath = os.path.join(dst_dir, "_SCALE_MANIFEST.json")
    try:
        with open(mpath) as fh:
            if json.load(fh) == manifest:
                return manifest
    except (OSError, ValueError):
        pass
    os.makedirs(dst_dir, exist_ok=True)
    strides = {
        name: int(
            pq.read_table(
                os.path.join(src_dir, f"{t}.parquet"), columns=[c]
            )
            .column(c)
            .to_numpy(zero_copy_only=False)
            .max()
        )
        + 1
        for name, (t, c) in _STRIDE_SOURCE.items()
    }
    for table in tables:
        src = pq.read_table(os.path.join(src_dir, f"{table}.parquet"))
        dst = os.path.join(dst_dir, f"{table}.parquet")
        if table in ("region", "nation"):
            pq.write_table(src, dst)
            continue
        writer = pq.ParquetWriter(dst, src.schema)
        try:
            for k in range(factor):
                writer.write_table(_scaled_replica(table, src, k, strides))
        finally:
            writer.close()
    with open(mpath, "w") as fh:
        json.dump(manifest, fh)
    return manifest
