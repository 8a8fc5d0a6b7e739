"""Interactive search layer (reference search_subnetwork,
network_generator_lib.R:212-231; SURVEY.md §2.7 Q1-Q7).

Dispatch by regex on the search string, exactly as the reference:

  Q1  range      ``chr:start[-end]``      → overlap filter (±expand) or
                                            nearest fallback
  Q2  fragment   ``chr_start_end``        → exact vertex lookup
  Q3  gene name  anything else            → word-boundary match against
                                            gene_names + alias
  Q4  ensembl id ``ENS[MUS]G…``           → translate via ensembl2name,
                                            then Q3
  Q5  multi-term split on ``[, \\t]``     → union of Q3/Q4 results

Result = 1-hop ego graph(s) of the matched nodes, matched nodes flagged
``searched`` (serialized as the string "true"/"false" — reference
network_generator_lib.R:87-88), per-subnetwork degree recomputed
(Q7, reference :223-226).

Serving-scale design: ``nodes``/``edges`` are expected .persist()'ed by
the serving session (the reference's search_cache.Rdata, SURVEY S9/S12);
a production deployment would add the inverted token index
(``build_token_index``) as a materialized table bucketed by token.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.graph import degrees, ego_nodes, induced_subgraph
from ..operators.interval import nearest_interval_join, range_query

_RANGE_RE = re.compile(r"^(([12]?[0-9])|([XYxy])):(\d+)(-(\d+))?$")
_FRAGMENT_RE = re.compile(r"^(([12]?[0-9])|([XYxy]))_\d+_\d+$", re.IGNORECASE)
_ENSEMBL_RE = re.compile(r"^ens(mus)?g\d+", re.IGNORECASE)


def build_token_index(nodes: DataFrame, alias_col: str | None = "alias") -> DataFrame:
    """Inverted index (token_lower → fragment) over gene_names + alias —
    the scalable replacement for the reference's per-query regex scan of
    every vertex (network_generator_lib.R:90-129): a gene query becomes
    an equi-join instead of a full scan."""
    cols = [F.col("gene_names")]
    if alias_col and alias_col in nodes.columns:
        cols.append(F.col(alias_col))
    blob = F.concat_ws(" ", *cols)
    return (
        nodes.select(
            F.col("fragment"),
            F.explode(F.split(F.lower(blob), r"[ ;,]+")).alias("token"),
        )
        .filter(F.col("token") != "")
        .distinct()
    )


def _gene_seeds(nodes: DataFrame, term: str, alias_col: str = "alias") -> DataFrame:
    """Q3: case-insensitive word-boundary match of the term against
    gene_names (+ alias when present) — reference regex(\\bterm\\b)
    at network_generator_lib.R:112."""
    cols = [F.col("gene_names")]
    if alias_col in nodes.columns:
        cols.append(F.col(alias_col))
    blob = F.lower(F.concat_ws(" ", *cols))
    pat = r"\b" + re.escape(term.lower()) + r"\b"
    return nodes.filter(blob.rlike(pat)).select("fragment")


def _ensembl_seeds(nodes: DataFrame, term: str, ensembl2name: DataFrame) -> DataFrame:
    """Q4: ensembl id → gene name via the broadcast ensembl2name map,
    then Q3 (reference network_generator_lib.R:95-99)."""
    names = (
        ensembl2name.filter(F.lower(F.col("ensembl_id")) == term.lower())
        .select("gene_name")
        .collect()
    )
    if not names:
        return nodes.select("fragment").limit(0)
    out = None
    for r in names:
        s = _gene_seeds(nodes, r["gene_name"])
        out = s if out is None else out.union(s)
    return out.distinct()


def _range_seeds(
    nodes: DataFrame, term: str, expand: int, nearest: bool
) -> DataFrame:
    m = _RANGE_RE.match(term)
    chrom = m.group(1).upper()
    qstart = int(m.group(4))
    qend = int(m.group(6)) if m.group(6) else qstart
    hits = range_query(nodes, chrom, qstart, qend, expand=expand).select("fragment")
    if nearest or hits.limit(1).isEmpty():
        # fallback/nearest mode: single closest fragment (reference
        # network_generator_lib.R:177-193)
        q = nodes.sparkSession.createDataFrame(
            [(chrom, qstart - expand, qend + expand)], "chr string, qs long, qe long"
        )
        nn = nearest_interval_join(
            q,
            nodes.select("chr", "start", "end", "fragment"),
            on="chr",
            query_range=("qs", "qe"),
            target_range=("start", "end"),
            target_id="fragment",
        )
        return nn.select("fragment")
    return hits


def search_subnetwork(
    nodes: DataFrame,
    edges: DataFrame,
    search: str,
    ensembl2name: DataFrame | None = None,
    expand: int = 0,
    nearest: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Dispatch → seeds → union-of-ego-graphs → induced edges →
    per-subnet degree. Returns (sub_nodes with ``searched`` string flag
    and recomputed ``degree``, sub_edges). Empty seeds → empty frames
    (the "{}" sentinel belongs to the serialization layer)."""
    terms = [t for t in re.split(r"[,\s\t]+", search.strip()) if t]
    seed_frames = []
    for term in terms:
        if _RANGE_RE.match(term):
            seed_frames.append(_range_seeds(nodes, term, expand, nearest))
        elif _FRAGMENT_RE.match(term):
            seed_frames.append(
                nodes.filter(F.col("fragment") == term.upper()).select("fragment")
            )
        elif _ENSEMBL_RE.match(term) and ensembl2name is not None:
            seed_frames.append(_ensembl_seeds(nodes, term, ensembl2name))
        else:
            seed_frames.append(_gene_seeds(nodes, term))
    seeds = seed_frames[0]
    for s in seed_frames[1:]:
        seeds = seeds.union(s)
    seeds = seeds.distinct()

    e = edges.select("src", "dst", "type")
    hood = ego_nodes(e, seeds.withColumnRenamed("fragment", "node"))
    sub_edges = induced_subgraph(e, hood)
    sub_nodes = nodes.join(
        hood.withColumnRenamed("node", "fragment"), "fragment", "left_semi"
    )
    # searched flag (string contract) + per-subnetwork degree (Q7)
    sub_nodes = (
        sub_nodes.join(
            seeds.withColumn("searched", F.lit("true")), "fragment", "left"
        )
        .withColumn("searched", F.coalesce(F.col("searched"), F.lit("false")))
        .drop("degree")
    )
    deg = degrees(sub_edges.select("src", "dst"))
    sub_nodes = (
        sub_nodes.join(deg, sub_nodes["fragment"] == deg["node"], "left")
        .drop("node")
        .withColumn("degree", F.coalesce(F.col("degree"), F.lit(0)))
    )
    return sub_nodes, sub_edges
