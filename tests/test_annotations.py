"""Annotation joins (SURVEY S6-S8, J1-J3, J5, J11, A11) driven through
the real file readers on fixture TSVs."""

import json
import os
import tempfile

import pytest
from pyspark.sql import functions as F

from garden_net_backend_spark.plans.feature_metrics import merge_features
from garden_net_backend_spark.plans.materialize import write_artifacts
from garden_net_backend_spark.plans.network_build import (
    annotate_bait_names,
    annotate_features_on_nodes,
    annotate_intronic,
    annotate_nodes,
    annotate_promoter_names,
)
from garden_net_backend_spark.sources.readers import (
    read_alias_db,
    read_bait_names,
    read_feature,
    read_features_on_nodes,
    read_intronic_regions,
)

FIX = tempfile.mkdtemp(prefix="annot_fix_")


def _write(name, lines):
    p = os.path.join(FIX, name)
    with open(p, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    return p


@pytest.fixture(scope="module")
def nodes(spark):
    return spark.createDataFrame(
        [
            ("1_100_200", "Hoxa6", "1", 100, 200, "P"),
            ("1_300_400", "", "1", 300, 400, "O"),
            ("1_500_600", "Sox2 Nanog", "1", 500, 600, "P"),
            ("2_100_200", "", "2", 100, 200, "O"),
        ],
        "fragment string, gene_names string, chr string, start long, end long, type string",
    )


@pytest.fixture(scope="module")
def alias_db(spark):
    p = _write(
        "alias.tsv",
        [
            "chr\tstart\tend\tGene type\tEnsembl gene ID\tGene name\tAlias\tHGNC ID",
            "1\t250\t450\tprotein_coding\tENSG0001\tGeneA\tALIAS_A PKCβ\tHGNC:1",
            "1\t350\t380\tlincRNA\tENSG0002\tGeneB\tNA\tHGNC:2",
            "1\t90\t110\tprotein_coding\tENSG0003\tHOXA6\thox-alias\tHGNC:3",
            "1\t480\t650\tprotein_coding\tENSG0004\tSOX2\tsox-alias\tHGNC:4",
        ],
    )
    return read_alias_db(spark, p, "homo_sapiens")


def test_alias_reader_schema(alias_db):
    assert alias_db.columns == [
        "chr", "start", "end", "gene_type", "ensembl_id", "gene_name", "alias", "hgnc_id",
    ]
    assert alias_db.count() == 4


def test_alias_overlap_annotation(nodes, alias_db):
    from garden_net_backend_spark.plans.network_build import annotate_alias_overlap

    out = {r["fragment"]: r for r in annotate_alias_overlap(nodes, alias_db).collect()}
    # oe node 1_300_400 overlaps GeneA [250,450] and GeneB [350,380];
    # collapse sorted by gene name, NA alias → literal "NA" inside the blob
    assert out["1_300_400"]["ensembl_id"] == "ENSG0001 ENSG0002"
    assert out["1_300_400"]["gene_names"] == "GeneA GeneB"
    # non-ASCII alias token scrubbed (PKCβ), ASCII one kept
    assert "PKC" not in out["1_300_400"]["alias"]
    assert "ALIAS_A" in out["1_300_400"]["alias"]
    # promoters keep their own names; no-overlap oe gets ""
    assert out["1_100_200"]["gene_names"] == "Hoxa6"
    assert out["2_100_200"]["ensembl_id"] == ""


def test_promoter_name_alias_join(nodes, alias_db):
    out = {r["fragment"]: r for r in annotate_promoter_names(nodes, alias_db).collect()}
    # Hoxa6 matches alias row HOXA6 (case-insensitive)
    assert out["1_100_200"]["ensembl_id_p"] == "ENSG0003"
    # multi-name promoter: Sox2 matches, Nanog doesn't → positional "NA"
    assert out["1_500_600"]["ensembl_id_p"] == "ENSG0004 NA"
    # non-promoters untouched ("")
    assert out["1_300_400"]["ensembl_id_p"] == ""


def test_bait_names_annotation(spark, nodes):
    p = _write(
        "baits.tsv",
        [
            "Chr\tStart\tEnd\tgene_id\tensembl_id\tregion",
            "1\t100\t200\tHOXA6,HOXA-ALT\tENSG0003\tpromoter",
        ],
    )
    bn = read_bait_names(spark, p)
    out = {r["fragment"]: r["gene_names"] for r in annotate_bait_names(nodes, bn).collect()}
    assert out["1_100_200"] == "HOXA6 HOXA-ALT"  # P overwritten, comma → space
    assert out["1_500_600"] == "Sox2 Nanog"  # P without bait row keeps names
    assert out["1_300_400"] == ""  # O never overwritten


def test_intronic_annotation(spark, nodes):
    p = _write("intronic.tsv", ["chr\tstart\tend", "1\t350\t360", "1\t150\t160"])
    intr = read_intronic_regions(spark, p)
    out = {r["fragment"]: r["intronic_regions"] for r in annotate_intronic(nodes, intr).collect()}
    assert out["1_300_400"] is True  # O node overlapping
    assert out["1_100_200"] is False  # P overlaps but flag is O-only
    assert out["2_100_200"] is False


def test_features_on_nodes_annotation(spark, nodes):
    p = _write(
        "fon.tsv",
        ["fragment\tEZH2", "chr1_100_200\t0.5", "chr1_300_400\t1.5"],
    )
    feats = read_features_on_nodes(spark, p)
    out = {r["fragment"]: r["EZH2"] for r in annotate_features_on_nodes(nodes, feats).collect()}
    assert out["1_100_200"] == 0.5 and out["1_300_400"] == 1.5
    assert out["2_100_200"] is None
    # degenerate chr_start key variant
    p2 = _write("fon2.tsv", ["fragment\tK27", "chr1_100\t0.9"])
    feats2 = read_features_on_nodes(spark, p2)
    out2 = {r["fragment"]: r["K27"] for r in annotate_features_on_nodes(nodes, feats2).collect()}
    assert out2["1_100_200"] == 0.9


def test_annotate_nodes_composition(spark, nodes, alias_db):
    bn = read_bait_names(spark, _write("b2.tsv", ["Chr\tStart\tEnd\tgene_id\tensembl_id\tregion", "1\t100\t200\tX1\tE1\tr"]))
    intr = read_intronic_regions(spark, _write("i2.tsv", ["chr\tstart\tend", "1\t350\t360"]))
    out = annotate_nodes(nodes, alias_db=alias_db, bait_names=bn, intronic=intr)
    cols = set(out.columns)
    assert {"ensembl_id", "alias", "gene_type", "intronic_regions"} <= cols
    rows = {r["fragment"]: r for r in out.collect()}
    assert len(rows) == 4
    # REGRESSION: the intronic flag must survive composition AFTER the
    # alias/bait joins — a synthetic-row-id join-back inside
    # overlap_flag once mis-assigned flags when upstream partitioning
    # was join-shuffled (content-key join now)
    assert rows["1_300_400"]["intronic_regions"] is True
    assert rows["1_100_200"]["intronic_regions"] is False  # type P
    assert rows["2_100_200"]["intronic_regions"] is False  # wrong chr


def test_binarization_toggle(spark, nodes):
    p = _write("sig.bed", ["chr1\t120\t180\t3.7", "chr1\t310\t390\t0.0"])
    feats = read_feature(spark, p, "bed3")
    raw = {r["fragment"]: r["value"] for r in merge_features(nodes, feats).collect()}
    binz = {r["fragment"]: r["value"] for r in merge_features(nodes, feats, binarize=True).collect()}
    assert raw["1_100_200"] == 3.7 and binz["1_100_200"] == 1.0
    assert raw["1_300_400"] == 0.0 and binz["1_300_400"] == 0.0
    assert binz["2_100_200"] == 0.0


def test_write_artifacts(spark, nodes):
    edges = spark.createDataFrame(
        [("1_100_200", "1_300_400", "P-O")], "src string, dst string, type string"
    )
    d = tempfile.mkdtemp(prefix="artifacts_")
    arts = write_artifacts(nodes, edges, d)
    for name in ["metadata.json", "suggestions.json", "chromosomes.json"]:
        with open(os.path.join(d, name)) as fh:
            assert json.load(fh) == arts[name]
    assert arts["chromosomes.json"] == ["1", "2"]
    assert "Hoxa6" in arts["suggestions.json"]
    assert arts["metadata.json"]["nodes"] == 4
