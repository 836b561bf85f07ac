"""Deterministic sf0.3-scale dataset for the large-SF oracle sweep
(VERDICT r4 "Next round" #6).

The driver's generator isn't shipped, but the correctness gate is
Spark-vs-DuckDB on the SAME parquet files — so any deterministic
dataset with the driver schema exercises the overflow-hardened integer
paths (_mul_floordiv_wide, HLL/CMS/PQ bounds, the reduced crawl-trap
mix) at 3× cardinality. This tool unions K key-shifted copies of
/root/testdata/sf0.1:

- every fact-table key column shifts by copy · 10^7 (documents /
  embeddings by copy · 10^6), so joins stay consistent copy-internally
  and key-residue-derived operators see fresh key classes;
- document text gets a per-copy suffix (n_chars recomputed), so exact-
  dup classes don't trivially triple;
- embedding[0] shifts by copy · 2^-9 (exact in float32), so ANN
  distance ties across copies can't depend on tie-break order;
- dimension tables (region, nation) pass through unchanged.

Output: <out>/[table].parquet (default /root/repo/testdata_scaled/sf0.3,
~50 MB, gitignored — rerun this tool to regenerate).
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
OUT = "/root/repo/testdata_scaled/sf0.3"
COPIES = 3
OFF_BIG = 10_000_000  # order/customer/part/supplier/event/user keyspaces
OFF_SMALL = 1_000_000  # doc/vec keyspaces

# table -> {column: per-copy shift}
SHIFTS: dict[str, dict[str, int]] = {
    "customer": {"c_custkey": OFF_BIG},
    "orders": {"o_orderkey": OFF_BIG, "o_custkey": OFF_BIG},
    "lineitem": {
        "l_orderkey": OFF_BIG,
        "l_partkey": OFF_BIG,
        "l_suppkey": OFF_BIG,
    },
    "part": {"p_partkey": OFF_BIG},
    "supplier": {"s_suppkey": OFF_BIG},
    "events": {"event_id": OFF_BIG, "user_id": OFF_BIG},
    "documents": {"doc_id": OFF_SMALL},
    "embeddings": {"vec_id": OFF_SMALL},
    "region": {},
    "nation": {},
}
DIMS = ("region", "nation")  # single copy, unchanged


def _copy_of(name: str, tbl: pa.Table, k: int) -> pa.Table:
    for col, off in SHIFTS[name].items():
        idx = tbl.schema.get_field_index(col)
        shifted = pc.add(tbl.column(col), pa.scalar(k * off, pa.int64()))
        tbl = tbl.set_column(idx, col, shifted.cast(tbl.schema.field(col).type))
    if name == "documents" and k > 0:
        idx = tbl.schema.get_field_index("text")
        text = pc.binary_join_element_wise(
            tbl.column("text").cast(pa.string()), f" copy{k}", ""
        )
        tbl = tbl.set_column(idx, "text", text)
        nidx = tbl.schema.get_field_index("n_chars")
        tbl = tbl.set_column(
            nidx, "n_chars", pc.utf8_length(tbl.column("text")).cast(pa.int64())
        )
    if name == "embeddings" and k > 0:
        import numpy as np

        idx = tbl.schema.get_field_index("embedding")
        col = tbl.column("embedding").combine_chunks()
        arr = col.chunk(0) if isinstance(col, pa.ChunkedArray) else col
        flat = arr.values.to_numpy(zero_copy_only=False).copy()
        offsets = arr.offsets.to_numpy(zero_copy_only=False)
        flat[offsets[:-1]] += np.float32(k * 2.0**-9)
        new = pa.ListArray.from_arrays(
            arr.offsets, pa.array(flat, type=pa.float32())
        )
        tbl = tbl.set_column(idx, "embedding", new.cast(tbl.schema.field(idx).type))
    return tbl


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else OUT
    os.makedirs(out, exist_ok=True)
    for name in SHIFTS:
        src = pq.read_table(os.path.join(SRC, f"{name}.parquet"))
        if name in DIMS:
            scaled = src
        else:
            scaled = pa.concat_tables(
                _copy_of(name, src, k) for k in range(COPIES)
            )
        pq.write_table(scaled, os.path.join(out, f"{name}.parquet"))
        print(f"{name}: {src.num_rows} -> {scaled.num_rows} rows")


if __name__ == "__main__":
    main()
