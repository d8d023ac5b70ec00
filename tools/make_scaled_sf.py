"""Build a synthetic scaled copy of a testdata SF dir (measurement only).

The driver's sf1.0 directory is generated at measurement time and is not
kept in the sandbox, so optimization rounds need a stand-in at that scale
to check that plan shapes and timings hold beyond sf0.1.  This tool
replicates every table of a source SF dir K times with deterministic key
offsets so join/group cardinalities scale linearly instead of exploding:

* fact/dimension keys (orderkey, custkey, partkey, suppkey, doc_id,
  vec_id, event_id, user_id) are offset by ``replica * span`` so each
  replica is a disjoint key range;
* document text gets a per-replica prefix (and n_chars is recomputed) so
  exact/near-dup operators see distinct documents, not a 10x dup blowup
  the real generator would never produce;
* embeddings are rolled by ``replica`` positions (norm-preserving) so
  vector dedup does not collapse replicas into cosine-1.0 clusters;
* nation/region stay fixed (true dimensions).

Timings from the output are comparable across THIS tool's outputs (same
transformation), not bit-comparable to the driver's own generator.

Usage:
    python tools/make_scaled_sf.py /root/testdata/sf0.1 /root/sf_synth/sf1.0 10
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# per-table int64/32 key columns that must be offset per replica so that
# each replica occupies a disjoint key range
OFFSET_KEYS = {
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
FIXED_DIMS = {"nation", "region"}


def _span(col: pa.ChunkedArray) -> int:
    # power-of-10 span strictly above max(key) keeps ids readable and
    # guarantees disjoint ranges
    mx = pc.max(col).as_py() or 0
    span = 1
    while span <= mx:
        span *= 10
    return span


def scale_table(name: str, tbl: pa.Table, k: int) -> pa.Table:
    if name in FIXED_DIMS or k == 1:
        return tbl
    keys = OFFSET_KEYS.get(name, [])
    spans = {c: _span(tbl[c]) for c in keys}
    reps = []
    for i in range(k):
        t = tbl
        for c in keys:
            off = pa.scalar(i * spans[c], type=t.schema.field(c).type)
            t = t.set_column(t.schema.get_field_index(c), c,
                             pc.add(t[c], off))
        if name == "documents" and i > 0:
            text = pc.binary_join_element_wise(
                pa.scalar(f"[r{i}] "), pc.cast(t["text"], pa.string()), "")
            t = t.set_column(t.schema.get_field_index("text"), "text",
                             pc.cast(text, t.schema.field("text").type))
            t = t.set_column(t.schema.get_field_index("n_chars"), "n_chars",
                             pc.cast(pc.utf8_length(t["text"]), pa.int64()))
        if name == "embeddings" and i > 0:
            emb = t["embedding"].combine_chunks()
            arrs = emb.to_numpy(zero_copy_only=False)
            rolled = [np.roll(np.asarray(a, dtype=np.float32), i)
                      for a in arrs]
            new = pa.array([list(map(float, a)) for a in rolled],
                           type=t.schema.field("embedding").type)
            t = t.set_column(t.schema.get_field_index("embedding"),
                             "embedding", new)
        reps.append(t)
    return pa.concat_tables(reps)


def main() -> None:
    src, dst, k = sys.argv[1], sys.argv[2], int(sys.argv[3])
    os.makedirs(dst, exist_ok=True)
    for f in sorted(os.listdir(src)):
        if not f.endswith(".parquet"):
            continue
        name = f[:-len(".parquet")]
        tbl = pq.read_table(os.path.join(src, f))
        out = scale_table(name, tbl, k)
        pq.write_table(out, os.path.join(dst, f))
        print(f"{name}: {tbl.num_rows} -> {out.num_rows}")


if __name__ == "__main__":
    main()
