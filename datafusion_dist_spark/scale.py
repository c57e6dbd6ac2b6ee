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
* ``documents.text`` is transformed per replica with a BIJECTIVE
  character rotation (see :func:`_rotate_text`) — within-replica
  duplicate/near-dup structure, token-shingle dfs, char-n-gram dfs,
  and all length statistics are preserved EXACTLY (the same bijection
  applies to every doc), while cross-replica n-grams share nothing.
  Duplicate RATE therefore stays constant as the corpus grows, which
  is the honest target shape: naive replication would instead make
  every doc a 10-way near-dup of itself and quadratically inflate the
  true pair count, drowning the measurement.
* ``embeddings.embedding`` is rotated by ``k`` positions (numpy roll)
  COMPOSED with a per-replica sign flip keyed on the bits of ``k``
  (component j flips iff bit j%8 of k is set): the combined transform
  is orthogonal, so norms and within-replica cosine structure are
  identical, while cross-replica vectors decorrelate — and its period
  is lcm(64, 256) = 256, so no factor ≤ 130 produces byte-identical
  replica embeddings (roll alone repeats at k+64, which would
  manufacture cross-replica cosine-1.0 pairs and quadratically inflate
  the true pair count). Seed centroids (``vec_id < K``) keep pointing
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


def _char_rotation(k: int) -> dict[int, int]:
    """str.translate table for replica k: rotate a-z / A-Z by k mod 26
    and 0-9 by k mod 10; everything else (spaces, punctuation)
    unchanged. Case-compatible with the dedup tokenizer's lower():
    lower(rot(c)) == rot(lower(c))."""
    table: dict[int, int] = {}
    for base, span in ((ord("a"), 26), (ord("A"), 26), (ord("0"), 10)):
        for i in range(span):
            table[base + i] = base + (i + k) % span
    return table


def _rotate_text(texts, k: int):
    """Replica-k text transform: a per-replica BIJECTIVE character
    substitution (Caesar-style rotation of letters and digits).

    Why a bijection and not a token suffix: the transform must
    preserve every distributional property the dedup tier's cost
    depends on — token-shingle document frequencies, CHAR-n-gram
    document frequencies, text lengths — while decorrelating
    replicas. Two earlier drafts failed measurably (caught by the
    rehearsal itself): a ``tok~k`` suffix was split by the
    tokenizer's ``[^a-z0-9]`` normalization into standalone digit
    tokens (collapsing k-shingles into unigram anchors, x104 wall),
    and an alnum ``tokxkx`` suffix preserved token shingles but
    injected 4 shared boilerplate chars into every 24-char window,
    inflating char-span dfs 17x per replica (x87 wall on
    substring-span dedup). A character bijection is distortion-free
    by construction: within a replica every pairwise relation between
    docs is EXACTLY the source relation (the same bijection applies
    to both sides), and cross-replica n-grams collide only on
    letterless/digitless spans. Lengths are untouched, so n_chars
    and every length-based quality score replicate exactly.

    Period: letters cycle at 26, digits at 10 -> replicas collide
    only at k ≡ 0 (mod lcm(26,10)=130); factors above 130 would need
    a second rotation key."""
    if k == 0:
        return texts
    table = _char_rotation(k)
    return [None if t is None else t.translate(table) for t in texts]


def _scaled_replica(table: str, tbl, k: int, strides: dict[str, int]):
    """Replica k of one source table as a new pyarrow Table."""
    import numpy as np
    import pyarrow as pa

    if k == 0:
        return tbl
    cols = {name: tbl.column(name) for name in tbl.schema.names}
    for col, stride_of in _KEYS.get(table, {}).items():
        arr = cols[col].to_numpy(zero_copy_only=False)
        cols[col] = pa.array(
            arr + k * strides[stride_of], type=tbl.schema.field(col).type
        )
    if table == "documents":
        # Character-rotated text; n_chars needs no touch — the
        # bijection is length-preserving by construction.
        cols["text"] = pa.array(
            _rotate_text(cols["text"].to_pylist(), k), pa.string()
        )
    if table == "embeddings":
        mat = np.array(cols["embedding"].to_pylist(), dtype=np.float32)
        # Roll alone has period dim (=64): replicas k and k+64 would be
        # byte-identical, manufacturing cross-replica cosine-1.0 pairs
        # that quadratically inflate the true pair count. Compose it
        # with a per-replica deterministic sign flip (component j flips
        # iff bit j%8 of k is set): the combined transform is
        # orthogonal (permutation × diag ±1), so within-replica
        # cosines AND norms are exactly the source's, and its period
        # is lcm(dim, 256) ≥ 256 > the 130 factor cap.
        rolled = np.roll(mat, k, axis=1)
        j = np.arange(mat.shape[1] if mat.ndim == 2 else 0)
        signs = np.where((k >> (j % 8)) & 1, -1.0, 1.0).astype(np.float32)
        rolled = rolled * signs
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

    if factor > 130:
        raise ValueError(
            "factor > 130 exceeds the character-rotation period "
            "(lcm(26, 10)); replicas would repeat text verbatim. "
            "(The embedding transform — roll composed with a sign "
            "flip keyed on bits of k — has period lcm(64, 256) = 256 "
            "and is not the binding constraint.)"
        )
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
