"""Unit tests for the string/text column-function library (SURVEY §2.8)."""

from pyspark.sql import functions as F

from garden_net_backend_spark.functions.strings import (
    ascii_scrub,
    chaser_key,
    clean_gene_names,
    cytoscape_safe_name,
    fragment_key,
    fragment_to_chaser_key,
    na_to_empty,
    natural_chr_key,
    normalize_dot,
    percent_string,
)
from garden_net_backend_spark.functions.text import (
    doc_fingerprint,
    lang_id,
    quality_score,
    token_count,
)


def _one(spark, expr, **cols):
    df = spark.createDataFrame(
        [tuple(cols.values())], ", ".join(f"{k} string" for k in cols)
    )
    return df.select(expr.alias("out")).collect()[0]["out"]


def test_keys(spark):
    df = spark.createDataFrame([("X", 100, 200)], "chr string, s long, e long")
    row = df.select(
        fragment_key(F.col("chr"), F.col("s"), F.col("e")).alias("f"),
        chaser_key(F.col("chr"), F.col("s"), F.col("e")).alias("c"),
    ).collect()[0]
    assert row["f"] == "X_100_200"
    assert row["c"] == "chrX:100-200"
    df2 = spark.createDataFrame([("X_100_200",)], "frag string")
    assert (
        df2.select(fragment_to_chaser_key(F.col("frag")).alias("o")).collect()[0]["o"]
        == "chrX:100-200"
    )


def test_gene_name_cleanup(spark):
    assert _one(spark, clean_gene_names(F.col("x")), x="Hoxa6-001; Hoxa6,Sox2 ") == "Hoxa6 Sox2"
    assert _one(spark, clean_gene_names(F.col("x")), x=".") == ""
    assert _one(spark, normalize_dot(F.lit(None).cast("string"))) == ""
    assert _one(spark, na_to_empty(F.col("x")), x="NA") == ""
    assert _one(spark, na_to_empty(F.col("x")), x="real") == "real"


def test_ascii_scrub_and_cytoscape_names(spark):
    assert _one(spark, ascii_scrub(F.col("x")), x="PKCβ GOOD oké fine") == "GOOD fine"
    assert _one(spark, cytoscape_safe_name(F.col("x")), x="H3K27me3 (broad)[v2],x-y") == "H3K27me3broadv2xy"


def test_natural_chr_sort(spark):
    chroms = ["10", "1", "2", "X", "Y", "19", "PP"]
    df = spark.createDataFrame([(c,) for c in chroms], "chr string")
    got = [
        r["chr"]
        for r in df.orderBy(natural_chr_key(F.col("chr"))).collect()
    ]
    assert got == ["1", "2", "10", "19", "PP", "X", "Y"]


def test_percent_string(spark):
    df = spark.createDataFrame([(0.4237,)], "x double")
    assert df.select(percent_string(F.col("x")).alias("o")).collect()[0]["o"] == "42.37%"


def test_text_functions_edges(spark):
    # empty text → 0 tokens, quality 0, und language, fingerprint 0
    df = spark.createDataFrame([("",), ("   ",), ("the cat and the dog",)], "text string")
    rows = df.select(
        token_count(F.col("text")).alias("t"),
        quality_score(F.col("text")).alias("q"),
        lang_id(F.col("text")).alias("l"),
        doc_fingerprint(F.col("text")).alias("f"),
    ).collect()
    assert rows[0]["t"] == 0 and rows[0]["q"] == 0.0 and rows[0]["f"] == 0
    assert rows[1]["t"] == 0
    assert rows[2]["t"] == 5 and rows[2]["l"] == "en" and rows[2]["f"] > 0


def test_chunk_tokens_brute_force(spark):
    """chunk_tokens matches a pure-python sliding-window reference on
    varied shapes: empty, whitespace-only, shorter than one window,
    exact multiples, ragged tails, messy internal whitespace."""
    from garden_net_backend_spark.functions.text import chunk_tokens

    docs = [
        (0, ""),
        (1, "   "),
        (2, "one"),
        (3, " ".join(f"t{i}" for i in range(5))),
        (4, " ".join(f"t{i}" for i in range(8))),  # exact 2 windows
        (5, " ".join(f"t{i}" for i in range(23))),
        (6, "  a\tb\n c   d  "),
        (7, "\t"),  # whitespace-only but NOT space-only: F.trim strips
        (8, "\n\t \n"),  # only spaces, so these must be caught by the
        (9, "\ta b c d e f"),  # token-count guard, not the text filter
    ]
    max_tokens, overlap = 5, 2
    stride = max_tokens - overlap

    def ref(text):
        toks = text.split()
        out = []
        start = 0
        while start < len(toks):
            w = toks[start : start + max_tokens]
            out.append((len(out), " ".join(w), len(w)))
            start += stride
        return out

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["doc_id"], r["chunk_idx"]): (r["chunk_text"], r["n_chunk_tokens"])
        for r in chunk_tokens(df, max_tokens=max_tokens, overlap=overlap).collect()
    }
    want = {
        (d, i): (t, n) for d, text in docs for i, t, n in ref(text)
    }
    assert got == want
    # consecutive chunks share exactly `overlap` tokens (when full)
    full = [v[0].split() for (d, i), v in sorted(got.items()) if d == 5]
    for a, b in zip(full, full[1:]):
        if len(b) == max_tokens:
            assert a[-overlap:] == b[:overlap]


def test_hash_split_deterministic_and_proportional(spark):
    """hash_split: stable across runs/partitionings, labels only from
    the boundary set, fractions near the 204/26/26 design point, and
    exactly reproducible from md5 prefixes computed in python."""
    import hashlib

    from garden_net_backend_spark.functions.text import hash_split

    df = spark.range(0, 20000).withColumnRenamed("id", "k")
    got = {
        r["k"]: r["split"]
        for r in df.select("k", hash_split(F.col("k")).alias("split")).collect()
    }

    def ref(k):
        b = int(hashlib.md5(str(k).encode()).hexdigest()[:2], 16)
        return "train" if b < 204 else ("val" if b < 230 else "test")

    assert got == {k: ref(k) for k in range(20000)}
    n = len(got)
    frac = {s: sum(1 for v in got.values() if v == s) / n for s in set(got.values())}
    assert abs(frac["train"] - 204 / 256) < 0.02
    assert abs(frac["val"] - 26 / 256) < 0.01
    assert abs(frac["test"] - 26 / 256) < 0.01
    # repartitioning must not change assignments
    again = {
        r["k"]: r["split"]
        for r in df.repartition(13)
        .select("k", hash_split(F.col("k")).alias("split"))
        .collect()
    }
    assert again == got


def test_redact_pii(spark):
    from garden_net_backend_spark.functions.text import redact_pii

    rows = [
        ("write bob.smith+x@sub.example.co.uk now", "write <EMAIL> now"),
        ("call 555-123-4567 or 555.123.4567", "call <PHONE> or <PHONE>"),
        ("host 192.168.0.1 responded", "host <IP> responded"),
        ("a@b.io via 10.0.0.7 tel 800-555-1212", "<EMAIL> via <IP> tel <PHONE>"),
        ("no pii here 12345", "no pii here 12345"),
        # dotted IP must not be half-eaten by the phone pattern
        ("999.888.777.666", "<IP>"),
    ]
    df = spark.createDataFrame(rows, "t string, want string")
    out = df.select(redact_pii(F.col("t")).alias("got"), "want").collect()
    for r in out:
        assert r["got"] == r["want"]


def test_repetition_topgram_brute_force(spark):
    from collections import Counter

    from garden_net_backend_spark.functions.text import repetition_topgram

    docs = [
        (1, "a b a b a b c"),
        (2, "x"),                  # < 2 tokens → no row
        (3, ""),                   # empty → no row
        (4, "q r q r s s q r"),
        (5, "t u  t  u"),          # messy whitespace, tie 't u'/'u t'
        (6, "z z z z"),
    ]

    def ref(text):
        toks = text.split()
        if len(toks) < 2:
            return None
        grams = Counter(
            " ".join(toks[i : i + 2]) for i in range(len(toks) - 1)
        )
        c = max(grams.values())
        g = min(g for g, v in grams.items() if v == c)  # count desc, gram asc
        return (g, c, round(c * len(g) / len(text), 9))

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["top_gram"], r["top_count"], r["top_frac"])
        for r in repetition_topgram(df).collect()
    }
    want = {d: ref(t) for d, t in docs if ref(t) is not None}
    assert got == want


def test_gopher_rules_boundaries(spark):
    from garden_net_backend_spark.functions.text import gopher_rules
    from pyspark.sql import functions as F

    good = " ".join(["word"] * 60)                  # 60 words, wl=4, alpha 1.0
    too_short = " ".join(["word"] * 10)             # n_words < 50
    symbol_heavy = " ".join(["word"] * 50 + ["#"] * 10)  # sym ratio 10/60
    long_words = " ".join(["w" * 20] * 60)          # mean_wl 20 > 10
    numeric = " ".join(["123"] * 60)                # alpha frac 0
    rows = [
        (0, good), (1, too_short), (2, symbol_heavy), (3, long_words),
        (4, numeric), (5, ""), (6, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["g"].asDict()
        for r in df.select("doc_id", gopher_rules(F.col("text")).alias("g")).collect()
    }
    assert got[0]["keep"] is True
    assert got[0]["n_words"] == 60 and got[0]["mean_word_len"] == 4.0
    assert got[1]["keep"] is False                  # too few words
    assert got[2]["keep"] is False                  # symbol ratio ≥ 0.1
    assert got[2]["alpha_word_frac"] < 1.0
    assert got[3]["keep"] is False                  # words too long
    assert got[4]["keep"] is False and got[4]["alpha_word_frac"] == 0.0
    assert got[5] == {"n_words": 0, "mean_word_len": 0.0, "symbol_ratio": 0.0,
                      "alpha_word_frac": 0.0, "keep": False}
    assert got[6]["keep"] is False and got[6]["n_words"] == 0
