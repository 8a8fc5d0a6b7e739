"""Synthesize an ~Nx scale-up of a testdata sf dir for the SCALING.md
drill (judge r3 task 3): union N key-offset copies of each table so the
most expensive catalog queries can be timed at ~10x the bench scale and
super-linear behavior surfaces before it surfaces on a cluster.

Faithfulness choices (what a NATIVELY bigger corpus would look like):

- ``documents``: copy 0 is verbatim; copy c>0 doc_ids are offset and a
  per-copy tag token is interleaved after every 2nd token. Any 3+-token
  window therefore contains a copy tag, so there is ZERO cross-copy
  shingle/window overlap — intra-copy duplicate structure repeats
  per copy (dup volume scales ~Nx, linear) instead of every doc gaining
  N-1 cross-copy near-twins (which would scale pair volume ~N² — an
  artifact no real corpus growth produces).
- ``embeddings``: vec_ids offset; copy c vectors are rolled by c
  positions (norm-preserving, decorrelates copies so ANN candidate
  sets don't collapse onto the originals).
- fact tables (``lineitem``/``orders``/``customer``/``events``/
  ``part``/``supplier``): integer keys offset by c·(max_key+1) so
  intra-copy join relationships repeat per copy; event timestamps
  shifted by c days to widen, not pile up, the window-agg key space.
- dims (``region``/``nation``) copied verbatim.

Usage: python tools/make_scale_data.py [factor] [src_dir] [out_dir] [tables]
Defaults: 10 /root/testdata/sf0.1 /tmp/scaledata/sf1 <all>
``tables``: comma-separated subset to scale (e.g. "documents,embeddings"
for a deep LLM-pipeline-only drill); unlisted tables are copied
verbatim so every catalog reader still finds its inputs.
Writes nothing outside out_dir.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from garden_net_backend_spark.session import get_session


def _offset(df: DataFrame, c: int, cols: dict[str, int]) -> DataFrame:
    for col, step in cols.items():
        df = df.withColumn(col, F.col(col) + F.lit(c * step))
    return df


def _max_plus_one(df: DataFrame, col: str) -> int:
    return int(df.agg(F.max(col)).collect()[0][0]) + 1


def scale_documents(df: DataFrame, c: int, id_step: int) -> DataFrame:
    if c == 0:
        return df
    toks = F.filter(F.split(F.trim(F.col("text")), r"\s+"), lambda t: t != "")
    tagged = F.array_join(
        F.transform(
            toks,
            lambda t, i: F.when(
                i % 2 == 1, F.concat(t, F.lit(f" zcp{c}z"))
            ).otherwise(t),
        ),
        " ",
    )
    return (
        df.withColumn("doc_id", F.col("doc_id") + F.lit(c * id_step))
        .withColumn("text", F.when(F.trim("text") == "", F.col("text")).otherwise(tagged))
        .withColumn("n_chars", F.length("text"))
    )


def scale_embeddings(df: DataFrame, c: int, id_step: int) -> DataFrame:
    if c == 0:
        return df
    dim = F.size("embedding")
    rolled = F.concat(
        F.slice(F.col("embedding"), F.lit(c % 64) + 1, dim),
        F.slice(F.col("embedding"), 1, F.lit(c % 64)),
    )
    return df.withColumn("vec_id", F.col("vec_id") + F.lit(c * id_step)).withColumn(
        "embedding", rolled
    )


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out = sys.argv[3] if len(sys.argv) > 3 else "/tmp/scaledata/sf1"
    only = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None
    os.makedirs(out, exist_ok=True)
    spark = get_session("make_scale_data")

    def rd(name: str) -> DataFrame:
        return spark.read.parquet(os.path.join(src, f"{name}.parquet"))

    def wr(df: DataFrame, name: str) -> None:
        df.write.mode("overwrite").parquet(os.path.join(out, f"{name}.parquet"))
        print(f"{name}: {df.count()} rows", flush=True)

    def scaled(name: str) -> bool:
        return only is None or name in only

    # dims verbatim
    for t in ("region", "nation"):
        wr(rd(t), t)

    docs = rd("documents")
    if scaled("documents"):
        dstep = _max_plus_one(docs, "doc_id")
        docs = _union([scale_documents(docs, c, dstep) for c in range(factor)])
    wr(docs, "documents")

    emb = rd("embeddings")
    if scaled("embeddings"):
        estep = _max_plus_one(emb, "vec_id")
        emb = _union([scale_embeddings(emb, c, estep) for c in range(factor)])
    wr(emb, "embeddings")

    ev = rd("events")
    if scaled("events"):
        evstep = _max_plus_one(ev, "event_id")
        ustep = _max_plus_one(ev, "user_id")
        ev = _union(
            [
                _offset(ev, c, {"event_id": evstep, "user_id": ustep}).withColumn(
                    "ts", F.col("ts") + F.make_dt_interval(days=F.lit(c))
                )
                for c in range(factor)
            ]
        )
    wr(ev, "events")

    li = rd("lineitem")
    if scaled("lineitem"):
        osteps = {
            "l_orderkey": _max_plus_one(li, "l_orderkey"),
            "l_partkey": _max_plus_one(li, "l_partkey"),
            "l_suppkey": _max_plus_one(li, "l_suppkey"),
        }
        li = _union([_offset(li, c, osteps) for c in range(factor)])
    wr(li, "lineitem")

    for name, key in (
        ("orders", ["o_orderkey", "o_custkey"]),
        ("customer", ["c_custkey"]),
        ("part", ["p_partkey"]),
        ("supplier", ["s_suppkey"]),
    ):
        df = rd(name)
        if scaled(name):
            steps = {k: _max_plus_one(df, k) for k in key}
            df = _union([_offset(df, c, steps) for c in range(factor)])
        wr(df, name)
    print(f"done → {out}", flush=True)


def _union(frames: list[DataFrame]) -> DataFrame:
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


if __name__ == "__main__":
    main()
