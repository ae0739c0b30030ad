"""Generate the FULL sf1 testdata set (10x sf0.1) for the whole-suite
scale run.

documents/embeddings already exist in testdata_sf1/ (written by
bench_dedup_scale.py / bench_ann_scale.py with a realistic duplication
and cluster shape — naive 10x replication of sf0.1 documents would make
every doc a 10-way exact duplicate and quadratically explode every
near-dup candidate join, which is a different benchmark). The remaining
8 tables are built by KEY-OFFSET REPLICATION of the driver's sf0.1
parquet: 10 copies, with every join key shifted by a per-copy stride so
referential integrity holds within each copy and copies never collide:

    customer.c_custkey   <-> orders.o_custkey      stride 1_000_000
    orders.o_orderkey    <-> lineitem.l_orderkey   stride 10_000_000
    part.p_partkey       <-> lineitem.l_partkey    stride 1_000_000
    supplier.s_suppkey   <-> lineitem.l_suppkey    stride 1_000_000
    events.event_id                                 stride 10_000_000
    events.user_id                                  stride 1_000_000

Non-key values are preserved verbatim, so every filter/date/flag
distribution is exactly the sf0.1 distribution — per-row costs are
comparable across scales. region/nation are fixed dimensions and are
copied as-is (that is what a dimension does at scale).

Usage: python scripts/gen_sf1.py [--src /root/testdata/sf0.1] [--reps 10]
"""

from __future__ import annotations

import argparse
import os

import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# table -> {column: stride}; tables absent here are copied verbatim
OFFSETS: dict[str, dict[str, int]] = {
    "customer": {"c_custkey": 1_000_000},
    "orders": {"o_orderkey": 10_000_000, "o_custkey": 1_000_000},
    "lineitem": {
        "l_orderkey": 10_000_000,
        "l_partkey": 1_000_000,
        "l_suppkey": 1_000_000,
    },
    "part": {"p_partkey": 1_000_000},
    "supplier": {"s_suppkey": 1_000_000},
    "events": {"event_id": 10_000_000, "user_id": 1_000_000},
}
COPY_AS_IS = ("region", "nation")


def replicate(src_path: str, out_path: str, offsets: dict[str, int], reps: int) -> int:
    table = pq.read_table(src_path)
    copies = []
    for rep in range(reps):
        cols = []
        for name in table.column_names:
            col = table.column(name)
            if name in offsets and rep > 0:
                col = pa.compute.add(col, offsets[name] * rep)
                col = col.cast(table.schema.field(name).type)
            cols.append(col)
        copies.append(pa.table(dict(zip(table.column_names, cols))))
    out = pa.concat_tables(copies)
    pq.write_table(out, out_path)
    return out.num_rows


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=os.path.join(REPO, "testdata_sf1"))
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    for name in COPY_AS_IS:
        t = pq.read_table(os.path.join(args.src, f"{name}.parquet"))
        pq.write_table(t, os.path.join(args.out, f"{name}.parquet"))
        print(f"{name}: {t.num_rows} rows (copied)")

    for name, offs in OFFSETS.items():
        n = replicate(
            os.path.join(args.src, f"{name}.parquet"),
            os.path.join(args.out, f"{name}.parquet"),
            offs,
            args.reps,
        )
        print(f"{name}: {n} rows ({args.reps}x replicated)")


if __name__ == "__main__":
    main()
