"""Hypothesis property tests for the pure-Python kernels and the
packing layout — randomized inputs complementing the fixed-fixture
suites (SURVEY §5's strategy extended with generative coverage).

Spark-backed properties cap their example count (each example is a
Spark job); the pure codec properties run the full default budget.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


# ---------------------------------------------------------------------
# PNG codec: pure Python, full hypothesis budget
# ---------------------------------------------------------------------


@given(
    w=st.integers(1, 24),
    h=st.integers(1, 24),
    color_type=st.sampled_from([0, 2, 6]),
    data=st.data(),
)
@settings(max_examples=60, deadline=None)
def test_png_round_trip_random(w, h, color_type, data):
    from garden_net_backend_spark.functions.codecs import decode_png, encode_png

    ch = {0: 1, 2: 3, 6: 4}[color_type]
    px = bytes(
        data.draw(
            st.lists(
                st.integers(0, 255), min_size=w * h * ch, max_size=w * h * ch
            )
        )
    )
    assert decode_png(encode_png(w, h, px, color_type)) == (w, h, ch, px)


@given(payload=st.binary(min_size=0, max_size=64))
@settings(max_examples=40, deadline=None)
def test_png_decode_never_accepts_garbage(payload):
    """Arbitrary small byte strings must raise ValueError, never return
    pixels or crash with an unexpected exception type (a fuzz guard for
    the mapInPandas hot path)."""
    from garden_net_backend_spark.functions.codecs import decode_png

    with pytest.raises((ValueError, Exception)) as exc_info:
        decode_png(payload)
    # the decoder's declared failure mode is ValueError (struct/zlib
    # errors would mean a malformed-chunk path escaped validation)
    assert isinstance(exc_info.value, ValueError), type(exc_info.value)


# ---------------------------------------------------------------------
# Sequence packing: layout invariants on random corpora (few examples —
# each runs a Spark job)
# ---------------------------------------------------------------------


@given(
    ntoks=st.lists(st.integers(0, 40), min_size=1, max_size=12),
    seq_len=st.integers(4, 16),
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_pack_sequences_invariants(spark, ntoks, seq_len):
    from garden_net_backend_spark.plans.mixing import pack_sequences

    rows = [(i, " ".join(["t"] * n), "s") for i, n in enumerate(ntoks)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    spans = pack_sequences(docs, tokens_per_seq=seq_len).collect()

    # token conservation per document
    per_doc: dict[int, int] = {}
    for r in spans:
        per_doc[r["doc_id"]] = per_doc.get(r["doc_id"], 0) + r["n_tokens_in_seq"]
        # span stays inside its sequence
        assert 0 <= r["tok_begin"] < seq_len
        assert 1 <= r["n_tokens_in_seq"] <= seq_len - r["tok_begin"]
    assert per_doc == {i: n for i, n in enumerate(ntoks) if n > 0}

    # sequences tile without gaps or overlaps: per seq, spans cover
    # [0, fill) where fill = seq_len except possibly the last sequence
    by_seq: dict[int, list] = {}
    for r in spans:
        by_seq.setdefault(r["seq_id"], []).append(r)
    if by_seq:
        last = max(by_seq)
        for sid, ss in by_seq.items():
            covered = sorted((r["tok_begin"], r["n_tokens_in_seq"]) for r in ss)
            pos = 0
            for begin, n in covered:
                assert begin == pos, f"gap/overlap in seq {sid}"
                pos += n
            assert pos == seq_len or sid == last


# ---------------------------------------------------------------------


@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["aa", "bb", "cc", "dd"]), min_size=0, max_size=14
        ),
        min_size=1,
        max_size=10,
    ),
    L=st.integers(2, 4),
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_duplicated_spans_property(spark, docs, L):
    """Random small-alphabet corpora (dense window collisions by
    construction) vs the brute-force reference: spans AND excision must
    match exactly for any corpus and window length."""
    from garden_net_backend_spark.operators.dedup import (
        duplicated_spans,
        excise_duplicate_spans,
    )
    import importlib.util as _ilu
    import os as _os

    _spec = _ilu.spec_from_file_location(
        "_dedup_tests",
        _os.path.join(_os.path.dirname(__file__), "test_dedup.py"),
    )
    _m = _ilu.module_from_spec(_spec)
    _spec.loader.exec_module(_m)
    _brute_spans = _m._brute_spans

    corpus = [(i, " ".join(ts)) for i, ts in enumerate(docs)]
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    got_spans = sorted(
        (r["doc_id"], r["span_begin"], r["span_end"])
        for r in duplicated_spans(df, min_tokens=L).collect()
    )
    want_spans, want_clean = _brute_spans(corpus, L)
    assert got_spans == want_spans
    got_clean = {
        r["doc_id"]: (r["clean_text"], r["n_kept_tokens"], r["n_cut_tokens"])
        for r in excise_duplicate_spans(df, min_tokens=L).collect()
    }
    assert got_clean == want_clean
