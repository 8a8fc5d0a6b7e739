"""Column-expression string function library (SURVEY.md §2.8).

Every function here is a pure pyspark.sql.functions composition —
JVM-side, whole-stage-codegen friendly. No Python UDFs: none of the
reference's string operations need one.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def fragment_key(chr_col: Column, start_col: Column, end_col: Column) -> Column:
    """Canonical fragment id ``{chr}_{start}_{end}``
    (reference network_generator_lib.R:327-330)."""
    return F.concat_ws("_", chr_col, start_col.cast("string"), end_col.cast("string"))


def chaser_key(chr_col: Column, start_col: Column, end_col: Column) -> Column:
    """The chaser/feature key spelling ``chr{c}:{s}-{e}``
    (reference network_generator_lib.R:515-516). One canonical key
    (fragment_key) + this formatter replaces the reference's
    back-and-forth conversions (merge_features.R:117-119)."""
    return F.concat(
        F.lit("chr"), chr_col, F.lit(":"), start_col.cast("string"), F.lit("-"), end_col.cast("string")
    )


def fragment_to_chaser_key(fragment: Column) -> Column:
    """``{chr}_{s}_{e}`` → ``chr{chr}:{s}-{e}``."""
    p = F.split(fragment, "_")
    return chaser_key(p.getItem(0), p.getItem(1), p.getItem(2))


def normalize_dot(col: Column) -> Column:
    """Gene name ``"."`` or NULL → ``""``
    (reference network_generator_lib.R:352)."""
    return F.when(col.isNull() | (col == "."), F.lit("")).otherwise(col)


def na_to_empty(col: Column) -> Column:
    """Literal ``"NA"`` strings and NULLs → ``""`` — applied to annotation
    columns after joins (reference network_generator_lib.R:728-733, 839-843)."""
    return F.when(col.isNull() | (col == "NA"), F.lit("")).otherwise(col)


def clean_gene_names(col: Column) -> Column:
    """Normalize a gene-name blob: drop ``.``/NULL, strip transcript
    suffixes like ``Hoxa6-001`` → ``Hoxa6``, split on ``;``/``,``/space,
    dedupe preserving first occurrence, re-join with single spaces
    (reference network_generator_lib.R:336-360)."""
    c = normalize_dot(col)
    c = F.regexp_replace(c, r"-\d+\b", "")  # transcript suffix strip (lib.R:355)
    toks = F.array_distinct(F.filter(F.split(F.trim(c), r"[ ;,]+"), lambda t: t != ""))
    return F.array_join(toks, " ")


def ascii_scrub(col: Column) -> Column:
    """Drop tokens containing non-ASCII characters (aliases like PKCβ
    break the reference's JSON writer; reference
    network_generator_lib.R:886-899). Kept for output parity."""
    toks = F.split(col, " ")
    kept = F.filter(toks, lambda t: ~t.rlike("[^\\x00-\\x7F]"))
    return F.array_join(kept, " ")


def cytoscape_safe_name(col: Column) -> Column:
    """Strip characters cytoscape chokes on from feature names
    (reference merge_features.R:131)."""
    return F.regexp_replace(col, r"[- ,\(\)\[\]]", "")


def natural_chr_key(col: Column) -> Column:
    """Sort key for numeric-aware chromosome ordering 1,2,…,19,X,Y,PP
    (reference str_sort(numeric=T), network_generator.R:244)."""
    return F.when(col.rlike("^[0-9]+$"), F.lpad(col, 4, "0")).otherwise(
        F.concat(F.lit("z"), col)
    )


def round_stable(col: Column, decimals: int = 2) -> Column:
    """Engine-stable decimal rounding of a double → double.

    ``round(double, k)`` is NOT portable: Spark rounds the shortest
    decimal representation (BigDecimal HALF_UP), DuckDB computes
    ``round(x·10^k)/10^k`` in float arithmetic — for doubles within
    half an ulp of a .5 boundary (e.g. 1475.5/10000*100) the two
    disagree by a full last digit (caught by the adversarial regen
    simulation). Bridging through ``decimal(28,10)`` first makes the
    half-up decision on an exact decimal in BOTH engines; mirror with
    ``round(CAST(x AS DECIMAL(28,10)), k)`` in oracle SQL."""
    return F.round(col.cast("decimal(28,10)"), decimals).cast("double")


def percent_string(col: Column, decimals: int = 2) -> Column:
    """``0.423`` → ``"42.3%"`` (reference network_generator_lib.R:417)."""
    return F.concat(round_stable(col * 100, decimals).cast("string"), F.lit("%"))
