"""Regeneration drill: build a schema-compatible synthetic dataset with
a DIFFERENT seed plus adversarial edge cases, then run the oracle
harness against it — flushing corpus-dependent gate assumptions BEFORE
the driver regenerates testdata between rounds.

    python tools/regen_sim.py [out_dir]        # default /tmp/regen_sim
    python tools/verify_local.py /tmp/regen_sim

Round-3 catch record (all fixed): a planted zero embedding aborted the
cosine gates under ANSI mode; a planted duplicate vector broke q57's
planted-pairs-only oracle; unicode text broke the oracle's
STRING→BLOB cast; and acctbal=1475.5 exposed engine-divergent
round(double, k) (Spark rounds the shortest decimal repr, DuckDB
rounds x·10^k in float space).

Adversarial rows planted on purpose:
- documents: empty / space-only / tab-only / tab-leading / mixed-
  whitespace / unicode+emoji / single-token / symbol-heavy texts,
  plus exact and near duplicates.
- embeddings: one all-zero vector, one exact duplicate vector.
"""

from __future__ import annotations

import datetime
import json
import random
import sys

import pyarrow as pa
import pyarrow.parquet as pq


def write(out, table, columns, rows):
    arrays = {name: [r[i] for r in rows] for i, (name, _) in enumerate(columns)}
    schema = pa.schema(columns)
    pq.write_table(pa.table(arrays, schema=schema), f"{out}/{table}.parquet")


def main(out: str = "/tmp/regen_sim", seed: int = 20260814) -> None:
    import os

    os.makedirs(out, exist_ok=True)
    random.seed(seed)

    write(out, "region", [("r_regionkey", pa.int32()), ("r_name", pa.string())],
          [(i, f"REGION_{i}") for i in range(5)])
    write(out, "nation",
          [("n_nationkey", pa.int32()), ("n_name", pa.string()), ("n_regionkey", pa.int32())],
          [(i, f"NATION_{i}", i % 5) for i in range(25)])
    write(out, "supplier",
          [("s_suppkey", pa.int64()), ("s_name", pa.string()), ("s_nationkey", pa.int32()), ("s_acctbal", pa.float64())],
          [(i, f"Supplier#{i}", random.randrange(25), round(random.uniform(-999, 9999), 2)) for i in range(100)])
    write(out, "customer",
          [("c_custkey", pa.int64()), ("c_name", pa.string()), ("c_nationkey", pa.int32()), ("c_acctbal", pa.float64()), ("c_mktsegment", pa.string())],
          [(i, f"Customer#{i}", random.randrange(25), round(random.uniform(-999, 9999), 2),
            random.choice(["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"])) for i in range(1500)])
    words = ["azure", "blush", "coral", "dim", "ebony", "frost", "green", "hazel", "ivory", "jade"]
    write(out, "part",
          [("p_partkey", pa.int64()), ("p_name", pa.string()), ("p_brand", pa.string()), ("p_type", pa.string()), ("p_size", pa.int32()), ("p_retailprice", pa.float64())],
          [(i, " ".join(random.sample(words, 4)), f"Brand#{random.randrange(1, 6)}{random.randrange(1, 6)}",
            random.choice(["ECONOMY", "STANDARD", "PROMO"]) + " " + random.choice(["BRASS", "STEEL", "TIN"]),
            random.randrange(1, 51), round(random.uniform(900, 2000), 2)) for i in range(2000)])

    t0 = datetime.datetime(2024, 3, 1)
    write(out, "orders",
          [("o_orderkey", pa.int64()), ("o_custkey", pa.int64()), ("o_orderstatus", pa.string()), ("o_totalprice", pa.float64()), ("o_orderdate", pa.timestamp("us")), ("o_orderpriority", pa.string())],
          [(i, random.randrange(1500), random.choice("OFP"), round(random.uniform(1000, 300000), 2),
            t0 + datetime.timedelta(minutes=random.randrange(0, 500000)),
            random.choice(["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"])) for i in range(15000)])
    write(out, "lineitem",
          [("l_orderkey", pa.int64()), ("l_partkey", pa.int64()), ("l_suppkey", pa.int64()), ("l_linenumber", pa.int32()), ("l_quantity", pa.float64()), ("l_extendedprice", pa.float64()), ("l_discount", pa.float64()), ("l_tax", pa.float64()), ("l_returnflag", pa.string()), ("l_linestatus", pa.string()), ("l_shipdate", pa.timestamp("us"))],
          [(random.randrange(15000), random.randrange(2000), random.randrange(100), j % 7 + 1,
            float(random.randrange(1, 51)), round(random.uniform(900, 100000), 2),
            round(random.choice([0.0, 0.01, 0.05, 0.1]), 2), round(random.choice([0.0, 0.02, 0.08]), 2),
            random.choice("RAN"), random.choice("OF"),
            t0 + datetime.timedelta(minutes=random.randrange(0, 500000))) for j in range(60000)])
    write(out, "events",
          [("event_id", pa.int64()), ("ts", pa.timestamp("us")), ("user_id", pa.int64()), ("event_type", pa.string()), ("value", pa.float64()), ("props", pa.string())],
          [(i, t0 + datetime.timedelta(seconds=random.randrange(0, 2000000)), random.randrange(800),
            random.choice(["purchase", "click", "signup", "error", "view"]),
            round(random.uniform(0, 100), 3), json.dumps({"k": random.randrange(100)})) for i in range(10000)])

    vocab = ["delta", "omega", "prism", "quartz", "raven", "sigma", "tulip",
             "umbra", "vortex", "willow", "xenon", "yonder", "zephyr",
             "the", "a", "und", "der", "la", "el", "le"]
    docs = [" ".join(random.choice(vocab) for _ in range(random.randrange(20, 90)))
            for _ in range(500)]
    docs[7] = docs[3]                              # exact dup
    docs[11] = docs[3].replace("the", "thy", 1)    # near dup
    docs[20] = ""
    docs[21] = "   "
    docs[22] = "\t\t"
    docs[23] = "\ta b c d e f g h"
    docs[24] = "word\nnext\tline  mixed   whitespace"
    docs[25] = "😀 unicode ünïcödé 文本 " * 3
    docs[26] = "single"
    docs[27] = "#### ### ## " * 10
    write(out, "documents",
          [("doc_id", pa.int64()), ("text", pa.string()), ("lang", pa.string()), ("source", pa.string()), ("n_chars", pa.int64())],
          [(i, t, random.choice(["en", "de", "fr", "es", "zh"]), f"src{i % 20}", len(t))
           for i, t in enumerate(docs)])

    emb = [(i, [round(random.gauss(0, 1), 4) for _ in range(64)], random.randrange(8))
           for i in range(500)]
    emb[13] = (13, [0.0] * 64, 0)                  # zero vector
    emb[17] = (17, emb[5][1], emb[5][2])           # exact duplicate vector
    write(out, "embeddings",
          [("vec_id", pa.int64()), ("embedding", pa.list_(pa.float32())), ("label", pa.int32())],
          emb)
    print(f"regen-sim written to {out}")


if __name__ == "__main__":
    args = sys.argv[1:3]
    if len(args) == 2:
        main(args[0], int(args[1]))
    else:
        main(*args)
