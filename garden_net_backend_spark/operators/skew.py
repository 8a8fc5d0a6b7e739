"""Skew-mitigation: salted join.

AQE's skew-join splitting (on in session.py) handles sort-merge skew
automatically; salting is the manual fallback for the cases AQE can't
split — aggregation hot keys and broadcast-ineligible joins where one
key is orders of magnitude hotter than the rest (chromosome chr1 vs
chrY in the genomic domain; "the" in token tables).

``salted_join``: fan the SKEWED side out over ``n_salts`` synthetic
sub-keys (a deterministic hash of the row, not rand() — reproducible),
replicate the other side once per salt, join on (key, salt). Result is
row-identical to the plain join; the hot key's work is spread across
``n_salts`` tasks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``skewed ⋈ other`` on ``key`` with the skewed side
    salted. ``other`` is replicated ``n_salts``× — keep it the smaller
    side. Supported ``how``: inner, left (semantics identical to the
    unsalted join)."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    s = skewed.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(n_salts))
    )
    o = other.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = s.join(o, [key, "_salt"], how)
    return out.drop("_salt")


def salted_count(df: DataFrame, key: str, n_salts: int = 16) -> DataFrame:
    """Two-phase count for hot grouping keys: partial count per
    (key, salt), then final sum per key — the manual map-side-combine
    for keys so hot that even partial aggregation leaves one monster
    reduce task. → (key, count)."""
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    )
    partial = salted.groupBy(key, "_salt").agg(F.count("*").alias("_c"))
    return partial.groupBy(key).agg(F.sum("_c").alias("count"))
