"""Declared schemas for every source format the engine reads.

The reference infers most schemas but hand-forces chromosome columns to
string (reference network_generator_lib.R:283-284) because chr values
like ``X``, ``Y``, ``MT`` must never be inferred numeric. Here every
format has a full explicit StructType — no inference anywhere.

Genomic coordinates are LongType (they reach ~2.5e8; long is safe for
any genome). Scores are DoubleType.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- PCHiC interaction table (reference network_generator_lib.R:281-286,
#     column layout asserted at tests/test_network_generator.R:48-49).
#     Score columns beyond the fixed 11 are per-cell-type CHiCAGO scores;
#     the threshold column is positionally column 12.
PCHIC_FIXED_FIELDS = [
    T.StructField("baitChr", T.StringType(), False),
    T.StructField("baitStart", T.LongType(), False),
    T.StructField("baitEnd", T.LongType(), False),
    T.StructField("baitID", T.LongType(), True),
    T.StructField("baitName", T.StringType(), True),
    T.StructField("oeChr", T.StringType(), False),
    T.StructField("oeStart", T.LongType(), False),
    T.StructField("oeEnd", T.LongType(), False),
    T.StructField("oeID", T.LongType(), True),
    T.StructField("oeName", T.StringType(), True),
    T.StructField("dist", T.DoubleType(), True),
]


def pchic_schema(score_cols: list[str]) -> T.StructType:
    """PCHiC schema with the given per-cell-type score columns (>=1)."""
    return T.StructType(
        PCHIC_FIXED_FIELDS + [T.StructField(c, T.DoubleType(), True) for c in score_cols]
    )


# --- plain Hi-C, 6 columns, renamed to the bait/oe convention
#     (reference network_generator_lib.R:292-299)
HIC_SCHEMA = T.StructType(
    [
        T.StructField("baitChr", T.StringType(), False),
        T.StructField("baitStart", T.LongType(), False),
        T.StructField("baitEnd", T.LongType(), False),
        T.StructField("oeChr", T.StringType(), False),
        T.StructField("oeStart", T.LongType(), False),
        T.StructField("oeEnd", T.LongType(), False),
    ]
)

# --- canonical node/edge tables (reference network_generator_lib.R:323-391)
NODE_SCHEMA = T.StructType(
    [
        T.StructField("fragment", T.StringType(), False),  # "{chr}_{start}_{end}"
        T.StructField("gene_names", T.StringType(), True),
        T.StructField("chr", T.StringType(), False),
        T.StructField("start", T.LongType(), False),
        T.StructField("end", T.LongType(), False),
        T.StructField("type", T.StringType(), False),  # "P" | "O"
    ]
)

EDGE_SCHEMA = T.StructType(
    [
        T.StructField("src", T.StringType(), False),
        T.StructField("dst", T.StringType(), False),
        T.StructField("type", T.StringType(), False),  # "P-P" | "P-O" | "O-O"
    ]
)

# --- BED-family feature formats (reference backend.py:181-195,
#     chaser::load_features call sites; FIXTURES.md §4)
BED3_SCHEMA = T.StructType(
    [
        T.StructField("chr", T.StringType(), False),
        T.StructField("start", T.LongType(), False),
        T.StructField("end", T.LongType(), False),
        T.StructField("signal", T.DoubleType(), True),
    ]
)

BED6_SCHEMA = T.StructType(
    [
        T.StructField("chr", T.StringType(), False),
        T.StructField("start", T.LongType(), False),
        T.StructField("end", T.LongType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("score", T.DoubleType(), True),
        T.StructField("strand", T.StringType(), True),
    ]
)

MACS2_SCHEMA = T.StructType(
    [
        T.StructField("chr", T.StringType(), False),
        T.StructField("start", T.LongType(), False),
        T.StructField("end", T.LongType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("score", T.DoubleType(), True),
        T.StructField("strand", T.StringType(), True),
        T.StructField("signalValue", T.DoubleType(), True),
        T.StructField("pValue", T.DoubleType(), True),
        T.StructField("qValue", T.DoubleType(), True),
        T.StructField("peak", T.LongType(), True),
    ]
)

CHROMHMM_SCHEMA = T.StructType(
    [
        T.StructField("chr", T.StringType(), False),
        T.StructField("start", T.LongType(), False),
        T.StructField("end", T.LongType(), False),
        T.StructField("state", T.StringType(), False),
    ]
)

BEDGRAPH_SCHEMA = T.StructType(  # "features_table" in the reference
    [
        T.StructField("chr", T.StringType(), False),
        T.StructField("start", T.LongType(), False),
        T.StructField("end", T.LongType(), False),
        T.StructField("value", T.DoubleType(), True),
    ]
)

# canonical long-form feature interval table every feature reader emits
FEATURE_INTERVAL_SCHEMA = T.StructType(
    [
        T.StructField("chr", T.StringType(), False),
        T.StructField("start", T.LongType(), False),
        T.StructField("end", T.LongType(), False),
        T.StructField("feature", T.StringType(), False),
        T.StructField("value", T.DoubleType(), True),
    ]
)

# --- gene alias DB (reference network_generator.R:107; columns used at
#     network_generator_lib.R:650-654 homo / :757-760 mus)
def alias_schema(organism: str) -> T.StructType:
    id_col = "HGNC ID" if organism.lower().startswith("homo") else "MGI ID"
    return T.StructType(
        [
            T.StructField("chr", T.StringType(), False),
            T.StructField("start", T.LongType(), False),
            T.StructField("end", T.LongType(), False),
            T.StructField("Gene type", T.StringType(), True),
            T.StructField("Ensembl gene ID", T.StringType(), True),
            T.StructField("Gene name", T.StringType(), True),
            T.StructField("Alias", T.StringType(), True),
            T.StructField(id_col, T.StringType(), True),
        ]
    )


# --- HindIII bait annotation (reference network_generator_lib.R:869-877)
BAIT_NAMES_SCHEMA = T.StructType(
    [
        T.StructField("Chr", T.StringType(), False),
        T.StructField("Start", T.LongType(), False),
        T.StructField("End", T.LongType(), False),
        T.StructField("gene_id", T.StringType(), True),
        T.StructField("ensembl_id", T.StringType(), True),
        T.StructField("region", T.StringType(), True),
    ]
)

# --- intronic regions (reference network_generator_lib.R:853-855)
INTRONIC_SCHEMA = T.StructType(
    [
        T.StructField("chr", T.StringType(), False),
        T.StructField("start", T.LongType(), False),
        T.StructField("end", T.LongType(), False),
    ]
)
