"""Synthesize a LOCAL sf-scaled copy of the driver testdata layout.

The driver's round-end bench may escalate to a larger scale factor
(BENCH_r06.json ran at sf1.0) whose directory is driver-generated and
not present between rounds. This tool builds an *approximate* dataset
with the same schemas, row counts, and value distributions as the
driver's tables (profiled from /root/testdata/sf0.1) so optimization
work can be measured at the escalated scale locally. It is NOT the
driver's data: absolute numbers from it are comparable run-to-run
locally, not to driver artifacts bit-for-bit.

Usage: python tools/make_local_sf.py [SF] [OUTDIR]
  default SF=1.0, OUTDIR=/root/sfgen/sf<SF>

Deterministic (seed 42). Small dimension tables (region, nation,
supplier, part) are copied from sf0.1 unchanged.
"""

from __future__ import annotations

import os
import shutil
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

BASE = "/root/testdata/sf0.1"
BASE_SF = 0.1

VOCAB = None  # filled from the sf0.1 documents (the driver's 31-word list)
LANGS = ["en", "zh", "fr", "es", "de"]
LANG_P = [0.40, 0.15, 0.15, 0.15, 0.15]


def _rng():
    return np.random.default_rng(42)


def gen_documents(sf: float, out: str) -> None:
    global VOCAB
    if VOCAB is None:
        import collections

        texts = pq.read_table(f"{BASE}/documents.parquet", columns=["text"])
        c = collections.Counter()
        for t in texts.column("text").to_pylist():
            c.update(t.split())
        VOCAB = sorted(c)
    n = int(50_000 * sf / 1.0 * 1.0) if sf >= 1 else int(5000 * sf / 0.1)
    n = max(50, int(round(sf * 50_000)))
    rng = _rng()
    lens = rng.integers(10, 101, size=n)
    vocab = np.array(VOCAB)
    words = vocab[rng.integers(0, len(vocab), size=int(lens.sum()))]
    texts = []
    pos = 0
    for L in lens:
        texts.append(" ".join(words[pos:pos + L]))
        pos += L
    langs = np.array(LANGS)[rng.choice(5, size=n, p=LANG_P)]
    srcs = np.array([f"src{i}" for i in range(20)])[rng.integers(0, 20, n)]
    tbl = pa.table({
        "doc_id": pa.array(np.arange(n), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs.tolist(), pa.string()),
        "source": pa.array(srcs.tolist(), pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    pq.write_table(tbl, f"{out}/documents.parquet")


def gen_lineitem(sf: float, out: str) -> None:
    n = int(round(sf * 6_000_000))
    n_orders = int(round(sf * 1_500_000))
    rng = _rng()
    ship = (np.datetime64("1995-01-01") +
            rng.integers(0, 2500, n).astype("timedelta64[D]"))
    tbl = pa.table({
        "l_orderkey": pa.array(rng.integers(0, n_orders, n), pa.int64()),
        "l_partkey": pa.array(rng.integers(0, int(200_000 * sf), n), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, int(10_000 * sf), n), pa.int64()),
        "l_linenumber": pa.array(rng.integers(1, 8, n).astype(np.int32)),
        "l_quantity": pa.array(rng.integers(1, 51, n).astype(np.float64)),
        "l_extendedprice": pa.array(
            np.round(900 + rng.random(n) * 104100, 2)),
        "l_discount": pa.array(np.round(rng.integers(0, 11, n) * 0.01, 2)),
        "l_tax": pa.array(np.round(rng.integers(0, 9, n) * 0.01, 2)),
        "l_returnflag": pa.array(
            np.array(["A", "N", "R"])[rng.integers(0, 3, n)].tolist()),
        "l_linestatus": pa.array(
            np.array(["F", "O"])[rng.integers(0, 2, n)].tolist()),
        "l_shipdate": pa.array(ship.astype("datetime64[us]")),
    })
    pq.write_table(tbl, f"{out}/lineitem.parquet")


def gen_orders_customer(sf: float, out: str) -> None:
    n = int(round(sf * 1_500_000))
    n_cust = int(round(sf * 150_000))
    rng = _rng()
    od = (np.datetime64("1995-01-01") +
          rng.integers(0, 2400, n).astype("timedelta64[D]"))
    tbl = pa.table({
        "o_orderkey": pa.array(np.arange(n), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n), pa.int64()),
        "o_orderstatus": pa.array(
            np.array(["P", "O", "F"])[rng.integers(0, 3, n)].tolist()),
        "o_totalprice": pa.array(np.round(1000 + rng.random(n) * 499000, 2)),
        "o_orderdate": pa.array(od.astype("datetime64[us]")),
        "o_orderpriority": pa.array(np.array(
            ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
        )[rng.integers(0, 5, n)].tolist()),
    })
    pq.write_table(tbl, f"{out}/orders.parquet")
    tbl = pa.table({
        "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
        "c_name": pa.array([f"Customer#{i:09d}" for i in range(n_cust)]),
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int64()),
        "c_acctbal": pa.array(np.round(-1000 + rng.random(n_cust) * 11000, 2)),
        "c_mktsegment": pa.array(np.array(
            ["FURNITURE", "MACHINERY", "AUTOMOBILE", "BUILDING", "HOUSEHOLD"]
        )[rng.integers(0, 5, n_cust)].tolist()),
    })
    pq.write_table(tbl, f"{out}/customer.parquet")


def gen_events(sf: float, out: str) -> None:
    n = int(round(sf * 1_000_000))
    n_users = int(round(sf * 15_000))
    rng = _rng()
    ts = (np.datetime64("2024-01-01", "us") +
          rng.integers(0, 30 * 86_400_000_000, n).astype("timedelta64[us]"))
    ts.sort()
    tbl = pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "ts": pa.array(ts),
        "user_id": pa.array(rng.integers(0, n_users, n), pa.int64()),
        "event_type": pa.array(np.array(
            ["view", "click", "purchase", "signup", "error"]
        )[rng.integers(0, 5, n)].tolist()),
        "value": pa.array(np.round(rng.exponential(60, n), 2)),
        "props": pa.array([f'{{"k": {k}}}' for k in rng.integers(0, 100, n)]),
    })
    pq.write_table(tbl, f"{out}/events.parquet")


def gen_embeddings(sf: float, out: str) -> None:
    n = int(round(sf * 20_000))
    rng = _rng()
    labels = rng.integers(0, 10, n).astype(np.int32)
    cents = rng.normal(0, 0.07 / 8, (10, 64))
    M = rng.normal(0, 1.0, (n, 64)) + cents[labels] * 8
    M = (M / np.linalg.norm(M, axis=1, keepdims=True)).astype(np.float32)
    tbl = pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": pa.array(list(M), pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    })
    pq.write_table(tbl, f"{out}/embeddings.parquet")


def main() -> None:
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    out = sys.argv[2] if len(sys.argv) > 2 else f"/root/sfgen/sf{sf}"
    os.makedirs(out, exist_ok=True)
    for small in ("region", "nation", "supplier", "part"):
        shutil.copy(f"{BASE}/{small}.parquet", f"{out}/{small}.parquet")
    gen_documents(sf, out)
    gen_lineitem(sf, out)
    gen_orders_customer(sf, out)
    gen_events(sf, out)
    gen_embeddings(sf, out)
    print(f"wrote sf{sf} tables to {out}")


if __name__ == "__main__":
    main()
