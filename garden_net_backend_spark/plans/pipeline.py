"""End-to-end training-corpus curation: the composition proof that the
pipeline operators snap together into ONE lazy plan chain.

    raw documents
      → Gopher quality filter            (functions/text.gopher_rules)
      → near-dup clustering              (dedup pairs → representatives)
      → keep one doc per cluster         (id == representative)
      → leakage-safe train/val/test      (plans/mixing.leakage_safe_split)
      → weighted source mixing           (plans/mixing.weighted_sample_by_source)
      → sequence packing of the kept set (plans/mixing.pack_sequences)

Everything stays DataFrame-lazy until the caller materializes; the only
actions are inside connected-components (bounded contraction). At
100 TB each stage is the scale shape proven by its own gate: the pair
graph is near-dup-sized, the rep/dup maps broadcast, the split/mix
decisions are zero-shuffle hash math, and packing shuffles once per
source shard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import gopher_rules
from .mixing import leakage_safe_split, pack_sequences, weighted_sample_by_source


def curate_training_corpus(
    docs: DataFrame,
    rates: dict[str, float],
    tokens_per_seq: int = 2048,
    dedup_threshold: float = 0.7,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
    seed: int = 0,
    default_rate: float = 1.0,
) -> dict[str, DataFrame]:
    """Run the full curation chain → ``{"documents", "sequences",
    "audit"}``.

    - ``documents``: input rows + ``gopher_keep``, ``representative``,
      ``split``, ``kept`` and the final ``selected`` flag (quality pass
      AND cluster representative AND mix-kept). Nothing is dropped —
      audits and ablations need the rejected rows WITH their reasons.
    - ``sequences``: ``pack_sequences`` spans over the selected TRAIN
      documents.
    - ``audit``: per (source, split) counts of selected vs rejected by
      reason — the driver-sized summary a pipeline run logs.
    """
    from ..operators.dedup import dedup_representatives, minhash_dedup_pairs

    flagged = docs.withColumn(
        "gopher_keep", gopher_rules(F.col(text_col))["keep"]
    )
    quality = flagged.filter(F.col("gopher_keep"))
    pairs = minhash_dedup_pairs(
        quality, text_col=text_col, id_col=id_col,
        threshold=dedup_threshold, shingle="word", ngram=3,
    )
    reps = dedup_representatives(quality, pairs, id_col=id_col)
    enriched = leakage_safe_split(flagged, reps, id_col=id_col).join(
        reps, id_col, "left"
    )
    mixed = weighted_sample_by_source(
        enriched, rates, source_col=source_col, id_col=id_col,
        seed=seed, default_rate=default_rate,
    )
    selected = (
        F.col("gopher_keep")
        & (F.col("representative").isNotNull())
        & (F.col(id_col) == F.col("representative"))
        & F.col("kept")
    )
    documents = mixed.withColumn("selected", F.coalesce(selected, F.lit(False)))
    train = documents.filter(F.col("selected") & (F.col("split") == "train"))
    sequences = pack_sequences(
        train, tokens_per_seq=tokens_per_seq,
        text_col=text_col, id_col=id_col, group_col=source_col,
    )
    audit = documents.groupBy(source_col, "split").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.col("selected").cast("int")).alias("n_selected"),
        F.sum((~F.col("gopher_keep")).cast("int")).alias("n_quality_rejected"),
        F.sum(
            (
                F.col("gopher_keep")
                & F.col("representative").isNotNull()
                & (F.col(id_col) != F.col("representative"))
            ).cast("int")
        ).alias("n_dup_dropped"),
        F.sum((F.col("gopher_keep") & ~F.col("kept")).cast("int")).alias(
            "n_mix_dropped"
        ),
    )
    return {"documents": documents, "sequences": sequences, "audit": audit}
