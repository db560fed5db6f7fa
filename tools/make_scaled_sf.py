"""Generate a scaled-up replica of a testdata sf dir for PERFORMANCE
rehearsals (scale-exponent measurement), not correctness: K key-shifted
copies of every fact table, dimension tables (region/nation) kept as-is.

Key families are offset consistently across tables (orderkey in both
lineitem and orders, custkey in both customer and orders, ...) so every
join keeps its selectivity; timestamps are untouched so date-range
filters keep their selectivity ratio.  Document text is passed through a
per-copy character translation, making each replica's shingle space
disjoint from the others — the dedup corpus becomes K independent
corpora and measured work scales cleanly instead of exploding in
cross-copy near-dup pairs.

Usage: python tools/make_scaled_sf.py [src_sf_dir] [dst_dir] [factor]
Defaults: /root/testdata/sf0.1 /tmp/sfscale/sf1 10
"""

from __future__ import annotations

import os
import string
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# key column -> family; every column of a family shifts by the same offset
KEY_FAMILIES = {
    "lineitem": {"l_orderkey": "order", "l_partkey": "part", "l_suppkey": "supp"},
    "orders": {"o_orderkey": "order", "o_custkey": "cust"},
    "customer": {"c_custkey": "cust"},
    "supplier": {"s_suppkey": "supp"},
    "part": {"p_partkey": "part"},
    "documents": {"doc_id": "doc"},
    "embeddings": {"vec_id": "vec"},
    "events": {"event_id": "event", "user_id": "user"},
}
DIMENSIONS = ["region", "nation"]


def _family_offsets(src: str) -> dict:
    offs: dict[str, int] = {}
    for tbl, fams in KEY_FAMILIES.items():
        t = pq.read_table(os.path.join(src, f"{tbl}.parquet"),
                          columns=list(fams))
        for col, fam in fams.items():
            hi = pc.max(t[col]).as_py() or 0
            offs[fam] = max(offs.get(fam, 0), hi + 1)
    return offs


def _translate_texts(col: pa.ChunkedArray, copy: int) -> pa.Array:
    """Per-copy letter rotation: length-preserving, similarity structure
    WITHIN a copy identical to the original, shingles across copies
    disjoint (copy 0 = identity)."""
    if copy == 0:
        return col.combine_chunks()
    lo = string.ascii_lowercase
    up = string.ascii_uppercase
    rot = copy % 25 + 1
    table = str.maketrans(lo + up, lo[rot:] + lo[:rot] + up[rot:] + up[:rot])
    return pa.array([None if v is None else v.translate(table)
                     for v in col.to_pylist()], type=col.type)


def _roll_vectors(col: pa.ChunkedArray, copy: int) -> pa.Array:
    """Per-copy cyclic component roll: norm-preserving, similarity
    structure WITHIN a copy identical to the original, directions across
    copies decorrelated (copy 0 = identity) — the embedding analog of
    the text translation, keeping cross-copy near-dup pairs from
    exploding the semantic-dedup rehearsal."""
    if copy == 0:
        return col.combine_chunks()
    vals = col.to_pylist()
    dim = next((len(v) for v in vals if v), 1)
    r = copy % dim or 1
    return pa.array([None if v is None else v[r:] + v[:r] for v in vals],
                    type=col.type)


def scale_dir(src: str, dst: str, factor: int) -> None:
    os.makedirs(dst, exist_ok=True)
    offs = _family_offsets(src)
    for tbl in DIMENSIONS:
        pq.write_table(pq.read_table(os.path.join(src, f"{tbl}.parquet")),
                       os.path.join(dst, f"{tbl}.parquet"))
        print(f"{tbl}: copied")
    for tbl, fams in KEY_FAMILIES.items():
        t = pq.read_table(os.path.join(src, f"{tbl}.parquet"))
        copies = []
        for i in range(factor):
            cols = []
            for name in t.schema.names:
                col = t[name]
                if name in fams:
                    col = pc.add(col, pa.scalar(i * offs[fams[name]],
                                                type=col.type))
                elif tbl == "documents" and name == "text":
                    col = _translate_texts(col, i)
                elif tbl == "embeddings" and name == "embedding":
                    col = _roll_vectors(col, i)
                cols.append(col)
            copies.append(pa.table(cols, schema=t.schema))
        out = pa.concat_tables(copies)
        pq.write_table(out, os.path.join(dst, f"{tbl}.parquet"))
        print(f"{tbl}: {t.num_rows} -> {out.num_rows}")


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfscale/sf1"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    scale_dir(src, dst, factor)
