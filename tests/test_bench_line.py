"""The driver tail-captures ~2000 chars of bench.py stdout and
json-parses the last line; r3's line overflowed and the driver recorded
``parsed: null``. render_bench_line is the guard: degrade precision to
fit, hard-fail rather than emit an unparseable/oversize line.

No Spark session needed — pure string/JSON logic."""

import json

import pytest

from bench import _MAX_LINE_CHARS, render_bench_line


def _timings(n, key_len=24):
    return {f"q{i:02d}_{'x' * (key_len - 4)}": 1.234 + i / 997 for i in range(n)}


def test_current_catalog_shape_fits():
    # 50 queries with realistic key lengths — today's catalog shape
    t = _timings(50)
    line = render_bench_line(sum(t.values()), t, "0.1")
    assert len(line) <= _MAX_LINE_CHARS
    parsed = json.loads(line)
    assert parsed["metric"] == "catalog_total_wall"
    assert set(parsed["queries"]) == set(t)
    assert parsed["sf"] == 0.1


def test_precision_degrades_before_overflow():
    # enough keys that 3-digit floats overflow but 1-digit fits
    t = _timings(53, key_len=26)
    full = json.dumps({k: round(v, 3) for k, v in t.items()})
    assert len(full) > _MAX_LINE_CHARS - 200  # the scenario is real
    line = render_bench_line(sum(t.values()), t, "0.1")
    assert len(line) <= _MAX_LINE_CHARS
    assert set(json.loads(line)["queries"]) == set(t)


def test_hopeless_overflow_raises():
    t = _timings(200, key_len=40)
    with pytest.raises(AssertionError, match="bench line"):
        render_bench_line(sum(t.values()), t, "0.1")


def test_non_numeric_sf_passthrough():
    t = _timings(5)
    assert json.loads(render_bench_line(1.0, t, "custom"))["sf"] == "custom"


def test_property_any_catalog_shape_fits_or_raises():
    """Property (hypothesis): for ANY plausible catalog shape the line
    either fits the driver window with the full key set intact, or
    raises — it never silently emits an oversize/lossy line."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    keys = st.text(
        alphabet="abcdefghijklmnopqrstuvwxyz0123456789_", min_size=3, max_size=48
    )
    vals = st.floats(
        min_value=0.0, max_value=9999.0, allow_nan=False, allow_infinity=False
    )

    @settings(max_examples=200, deadline=None)
    @given(st.dictionaries(keys, vals, min_size=1, max_size=90))
    def check(t):
        try:
            line = render_bench_line(sum(t.values()), t, "0.1")
        except AssertionError:
            return  # loud failure is the contract for hopeless shapes
        assert len(line) <= _MAX_LINE_CHARS
        assert set(json.loads(line)["queries"]) == set(t)

    check()
