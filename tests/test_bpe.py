"""BPE tokenizer tests: merge learning on a hand-checkable corpus,
greedy-encode equivalence with a pure-Python reference, exact
detokenization round trip, determinism under repartitioning."""

import pytest
from pyspark.sql import functions as F

from garden_net_backend_spark.operators.bpe import (
    _encode_word,
    bpe_encode,
    train_bpe_merges,
)


@pytest.fixture(scope="module")
def tiny(spark):
    rows = [
        (0, "low low low low low"),
        (1, "lower lower newest newest"),
        (2, "newest newest newest newest"),
        (3, "widest widest widest"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_train_merges_sennrich_example(tiny):
    """The classic low/lower/newest/widest corpus: first merges must
    assemble the 'est</w>' suffix and the 'lo' stem, by frequency."""
    merges = train_bpe_merges(tiny, num_merges=10)
    assert merges, "corpus repeats — merges must be learned"
    # most frequent pair overall: ('e','s') from newest(6)+widest(3)
    assert merges[0] == ("e", "s")
    assert ("es", "t") in merges[:3]
    joined = {a + b for a, b in merges}
    assert "est</w>" in joined          # suffix token forms
    assert "lo" in joined               # low/lower stem forms
    # determinism incl. repartitioning
    again = train_bpe_merges(tiny.repartition(5), num_merges=10)
    assert again == merges


def test_encode_matches_reference_and_roundtrips(tiny, spark):
    merges = train_bpe_merges(tiny, num_merges=8)
    ranks = {p: i for i, p in enumerate(merges)}
    docs = spark.createDataFrame(
        [(0, "low lowest newest widest unknown"), (1, ""), (2, "   ")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in bpe_encode(docs, merges).collect()}
    # pure-Python reference over the same merge table
    for i, text in [(0, "low lowest newest widest unknown"), (1, ""), (2, "   ")]:
        want = [s for w in text.split() for s in _encode_word(w, ranks)]
        assert list(got[i]["bpe_tokens"]) == want
        assert got[i]["n_bpe_tokens"] == len(want)
    # exact detokenization: join + split on the </w> markers
    toks = list(got[0]["bpe_tokens"])
    rebuilt = "".join(toks).replace("</w>", " ").strip()
    assert rebuilt == "low lowest newest widest unknown"
    # every token is either a learned merge product, a raw char, or
    # ends a word
    vocab = {a + b for a, b in merges} | {"</w>"}
    for t in toks:
        assert t in vocab or len(t.replace("</w>", "")) <= 1 or t in vocab


def test_encode_on_real_documents(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    merges = train_bpe_merges(docs, num_merges=200, sample_tokens=20_000)
    enc = bpe_encode(docs, merges)
    out = enc.agg(
        F.sum("n_bpe_tokens").alias("total"),
        F.count("*").alias("docs"),
    ).collect()[0]
    assert out["docs"] == docs.count()
    # BPE must compress vs character count and expand vs word count
    words = docs.select(
        F.sum(
            F.size(F.filter(F.split(F.trim("text"), r"\s+"), lambda t: t != ""))
        )
    ).collect()[0][0]
    chars = docs.select(F.sum(F.length("text"))).collect()[0][0]
    assert words <= out["total"] <= chars
    # deterministic across partitionings
    tot2 = bpe_encode(docs.repartition(13), merges).agg(
        F.sum("n_bpe_tokens")
    ).collect()[0][0]
    assert tot2 == out["total"]


def test_pack_by_bpe_counts(spark):
    """Composition: encode → pack in tokenizer units; span totals per
    doc equal the doc's BPE token count."""
    from garden_net_backend_spark.plans.mixing import pack_sequences

    docs = spark.createDataFrame(
        [(0, "aa bb aa bb aa bb", "s"), (1, "cc dd cc dd", "s")],
        "doc_id long, text string, source string",
    )
    merges = train_bpe_merges(docs, num_merges=4)
    enc = bpe_encode(docs, merges)
    joined = docs.join(enc.select("doc_id", "n_bpe_tokens"), "doc_id")
    packed = pack_sequences(joined, tokens_per_seq=5, n_tokens_col="n_bpe_tokens")
    per_doc = {
        r["doc_id"]: r["s"]
        for r in packed.groupBy("doc_id").agg(F.sum("n_tokens_in_seq").alias("s")).collect()
    }
    want = {r["doc_id"]: r["n_bpe_tokens"] for r in enc.collect()}
    assert per_doc == want
