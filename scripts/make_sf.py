"""Generate testdata-shaped tables at an arbitrary SF (round-5 verdict
task 6: one sf1 bench recording so at least one recorded number ranks
per-row work instead of fixed costs).

Mirrors the driver generator's SHAPE — same schemas, same categorical
vocabularies, same value ranges, same 30-day event window, same row
scaling laws (lineitem = 6M·sf, events = 1M·sf, documents/embeddings =
10× the sf0.1 counts per decade) — produced with numpy + pyarrow so a
6M-row lineitem builds in seconds. Only the tables the bench headline
mix reads are generated (events, orders, lineitem, customer,
documents, embeddings); writes go under /tmp, never /root/testdata
(read-only).

Usage: python scripts/make_sf.py --sf 1 --out /tmp/spark_graft_sf1
       SPARK_GRAFT_SF_DIR=/tmp/spark_graft_sf1 python bench.py
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EVENT_TYPES = ["view", "click", "purchase", "signup", "error"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
DAY_US = 86_400_000_000


def _write(out: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(out, f"{name}.parquet"))
    print(f"  {name}: {table.num_rows} rows", flush=True)


def make_events(out: str, n: int, n_users: int, rng: np.random.Generator) -> None:
    # 30-day window starting 2024-01-01 (epoch µs), sorted like the driver's
    base = np.datetime64("2024-01-01T00:00:00", "us").astype(np.int64)
    ts = np.sort(rng.integers(0, 30 * DAY_US, n)) + base
    _write(
        out,
        "events",
        pa.table(
            {
                "event_id": pa.array(np.arange(n), pa.int64()),
                "ts": pa.array(ts).cast(pa.timestamp("us")),
                "user_id": pa.array(rng.integers(0, n_users, n), pa.int64()),
                "event_type": pa.array(
                    np.array(EVENT_TYPES)[rng.integers(0, len(EVENT_TYPES), n)]
                ),
                "value": pa.array(np.round(rng.exponential(80.0, n), 2)),
                "props": pa.array([f'{{"k": {k}}}' for k in rng.integers(0, 100, n)]),
            }
        ),
    )


def make_customer(out: str, n: int, rng: np.random.Generator) -> None:
    _write(
        out,
        "customer",
        pa.table(
            {
                "c_custkey": pa.array(np.arange(n), pa.int64()),
                "c_name": pa.array([f"Customer#{i:09d}" for i in range(n)]),
                "c_nationkey": pa.array(rng.integers(0, 25, n), pa.int32()),
                "c_acctbal": pa.array(np.round(rng.uniform(-999, 9999, n), 2)),
                "c_mktsegment": pa.array(
                    np.array(SEGMENTS)[rng.integers(0, len(SEGMENTS), n)]
                ),
            }
        ),
    )


def make_orders_lineitem(
    out: str, n_orders: int, n_li: int, n_cust: int, n_parts: int, n_supp: int,
    rng: np.random.Generator,
) -> None:
    date0 = np.datetime64("1995-01-01T00:00:00", "us").astype(np.int64)
    odate = date0 + rng.integers(0, 2400, n_orders) * DAY_US
    _write(
        out,
        "orders",
        pa.table(
            {
                "o_orderkey": pa.array(np.arange(n_orders), pa.int64()),
                "o_custkey": pa.array(rng.integers(0, n_cust, n_orders), pa.int64()),
                "o_orderstatus": pa.array(
                    np.array(["O", "F", "P"])[rng.integers(0, 3, n_orders)]
                ),
                "o_totalprice": pa.array(np.round(rng.uniform(900, 400000, n_orders), 2)),
                "o_orderdate": pa.array(odate).cast(pa.timestamp("us")),
                "o_orderpriority": pa.array(
                    np.array(PRIORITIES)[rng.integers(0, len(PRIORITIES), n_orders)]
                ),
            }
        ),
    )
    sdate = date0 + rng.integers(0, 2500, n_li) * DAY_US
    _write(
        out,
        "lineitem",
        pa.table(
            {
                "l_orderkey": pa.array(rng.integers(0, n_orders, n_li), pa.int64()),
                "l_partkey": pa.array(rng.integers(0, n_parts, n_li), pa.int64()),
                "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
                "l_linenumber": pa.array(rng.integers(1, 8, n_li), pa.int32()),
                "l_quantity": pa.array(rng.integers(1, 51, n_li).astype(np.float64)),
                "l_extendedprice": pa.array(np.round(rng.uniform(900, 105000, n_li), 2)),
                "l_discount": pa.array(np.round(rng.integers(0, 11, n_li) / 100.0, 2)),
                "l_tax": pa.array(np.round(rng.integers(0, 9, n_li) / 100.0, 2)),
                "l_returnflag": pa.array(np.array(["R", "A", "N"])[rng.integers(0, 3, n_li)]),
                "l_linestatus": pa.array(np.array(["O", "F"])[rng.integers(0, 2, n_li)]),
                "l_shipdate": pa.array(sdate).cast(pa.timestamp("us")),
            }
        ),
    )


def make_documents(out: str, n: int, seed: int) -> None:
    from scale_curve import make_corpus

    # the scale-curve generator IS the documents shape (vocab text, 5%
    # near-dups, lang/source/n_chars columns)
    make_corpus(out, n, seed=seed)
    print(f"  documents: {n} rows", flush=True)


def make_embeddings(out: str, n: int, seed: int) -> None:
    from scale_curve import make_embeddings as gen

    # driver parity: 10 labels at every SF, label ~uncorrelated with
    # direction (noise=2.5) so pair-output volume matches the driver's
    # sparse statistics instead of drowning the bench in result rows
    gen(out, n, dim=64, seed=seed, per_label=n // 10, noise=2.5)
    print(f"  embeddings: {n} rows", flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=1.0)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    sf = args.sf
    out = args.out or f"/tmp/spark_graft_sf{sf:g}"
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(42)
    print(f"generating sf={sf:g} into {out}", flush=True)
    n_cust = int(150_000 * sf)
    make_events(out, int(1_000_000 * sf), n_users=int(15_000 * sf), rng=rng)
    make_customer(out, n_cust, rng)
    make_orders_lineitem(
        out,
        n_orders=int(1_500_000 * sf),
        n_li=int(6_000_000 * sf),
        n_cust=n_cust,
        n_parts=int(200_000 * sf),
        n_supp=int(10_000 * sf),
        rng=rng,
    )
    make_documents(out, int(50_000 * sf), seed=42)
    make_embeddings(out, int(20_000 * sf), seed=42)


if __name__ == "__main__":
    main()
