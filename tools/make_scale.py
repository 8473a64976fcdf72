"""Scale the sf0.1 fixtures to a larger scale factor for bench slope runs.

Replicates every table K times with all join/identity keys shifted by a
global stride per replica, so referential integrity and per-key cardinality
are preserved exactly: each replica is a disjoint copy of the sf0.1 world
(joins match only within a replica; group counts scale ×K; per-group sizes
stay constant — the same property TPC-H scaling has).

Output layout is a DIRECTORY per table (`<table>.parquet/part-NNNNN.parquet`)
with bounded row-group sizes — the multi-file, multi-row-group layout a real
cluster dataset has, so scans split into parallel tasks in both Spark and
DuckDB (the single-file single-row-group sf0.1 fixtures cap every scan at
one task; BASELINE.md §protocol documents that floor).

Usage:  python tools/make_scale.py [K] [src_dir] [out_dir]
Default: K=10 (sf0.1 -> sf1) into /root/repo/testdata_sf1
"""

from __future__ import annotations

import os
import shutil
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# One global stride keeps every cross-table key relationship consistent:
# all sf0.1 key values are < 10M, so replica i's keys live in
# [i*STRIDE, i*STRIDE + 10M) with no overlap.
STRIDE = 10_000_000

SHIFT_COLS = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "nation": [],     # fixed-size dims: copied once per replica? No —
    "region": [],     # dims stay a single copy (TPC-H: nation/region fixed)
}

FIXED_DIMS = {"nation", "region"}

# Files per table at K=10: sized so each file lands in the 8–32 MB range
# (one scan task each; row groups of <=256k rows inside).
FILES_PER_TABLE = {
    "lineitem": 16, "orders": 8, "events": 8, "customer": 4,
    "part": 4, "documents": 4, "embeddings": 4, "supplier": 2,
}


def scale_table(name: str, src: str, out_dir: str, k: int) -> int:
    tbl = pq.read_table(os.path.join(src, f"{name}.parquet"))
    dest = os.path.join(out_dir, f"{name}.parquet")
    if os.path.exists(dest):
        shutil.rmtree(dest)
    if name in FIXED_DIMS:
        os.makedirs(dest)
        pq.write_table(tbl, os.path.join(dest, "part-00000.parquet"))
        return tbl.num_rows

    replicas = []
    for i in range(k):
        r = tbl
        for col in SHIFT_COLS.get(name, []):
            idx = r.schema.get_field_index(col)
            shifted = pc.add(r.column(idx), pa.scalar(
                i * STRIDE, type=r.schema.field(idx).type))
            r = r.set_column(idx, r.schema.field(idx), shifted)
        replicas.append(r)
    big = pa.concat_tables(replicas)

    os.makedirs(dest)
    n_files = FILES_PER_TABLE.get(name, 4)
    rows_per_file = -(-big.num_rows // n_files)
    for f in range(n_files):
        chunk = big.slice(f * rows_per_file, rows_per_file)
        if chunk.num_rows == 0:
            break
        pq.write_table(chunk,
                       os.path.join(dest, f"part-{f:05d}.parquet"),
                       row_group_size=262_144)
    return big.num_rows


TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def ensure_sf1(out: str = "/root/repo/testdata_sf1",
               src: str = "/root/testdata/sf0.1", k: int = 10) -> str:
    """Self-provision the sf1 fixtures (round-8 verdict item 6).

    testdata_sf1 is gitignored (173 MB of derived parquet), so a fresh
    boot starts without it — which used to silently skip two
    test_session.py cases and break every sf1 tool until someone
    remembered the 2-minute regen. Call this wherever the fixture is
    read: builds any missing table deterministically (the generator is
    a pure function of the committed sf0.1 fixtures), returns the path.
    """
    missing = [t for t in TABLES
               if not os.path.isdir(os.path.join(out, f"{t}.parquet"))
               or not os.listdir(os.path.join(out, f"{t}.parquet"))]
    if missing:
        print(f"[make_scale] sf1 fixtures missing at {out} "
              f"({', '.join(missing)}) — regenerating (~2 min)")
        os.makedirs(out, exist_ok=True)
        for name in TABLES:
            scale_table(name, src, out, k)
        print(f"[make_scale] done -> {out}")
    return out


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "ensure_sf1":
        # idempotent check-or-build (the per-round revalidation entry)
        print(ensure_sf1())
        return
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out = sys.argv[3] if len(sys.argv) > 3 else "/root/repo/testdata_sf1"
    os.makedirs(out, exist_ok=True)
    for name in TABLES:
        n = scale_table(name, src, out, k)
        print(f"{name}: {n} rows")
    print(f"done -> {out}")


if __name__ == "__main__":
    main()
