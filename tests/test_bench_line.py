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


def test_non_finite_sf_degrades_to_string():
    """'nan'/'inf' inputs must not emit non-RFC NaN/Infinity literals
    (a strict driver-side parser would record parsed:null) — ADVICE r7."""
    t = _timings(5)
    for sf, expect in ((float("nan"), "nan"), ("inf", "inf"), ("-inf", "-inf")):
        line = render_bench_line(1.0, t, sf)
        assert json.loads(line)["sf"] == expect
        assert "NaN" not in line and "Infinity" not in line


def test_catalog_within_driver_correctness_window():
    """The driver's CORRECTNESS file records only the FIRST 50 SORTED
    query names (learned in r5: q68-q72 sorted past the window and got
    no driver row). Every catalog entry must stay inside that window —
    this assert is the r5-task-1 'done' clause the r6 judge flagged as
    missing."""
    from garden_net_backend_spark.queries import CATALOG

    assert len(CATALOG) <= 50, (
        f"CATALOG has {len(CATALOG)} entries; the driver's correctness "
        "window caps at the first 50 sorted names — fold the new gate "
        "into an existing suite instead of adding a 51st name"
    )


def test_bench_module_consistent_with_catalog():
    """`import bench` at module scope (done above) already proves the
    bench driver's imports survive a catalog rename — round 6's bench
    crashed at import on a renamed query fn and shipped zero numbers.
    Beyond importability, every attribution-note key and every special
    runner name must be a live catalog name."""
    import bench
    from garden_net_backend_spark.queries import CATALOG

    for key in bench.BENCH_NOTES:
        if not key.startswith("_"):
            assert key in CATALOG, f"stale BENCH_NOTES key: {key}"
    # the prebuilt-index override targets the live q38 gate
    src = open(bench.__file__).read()
    assert 'runners["q38_ann_suite"]' in src
    assert "warm_shared_network(spark, sf_dir)" in src


def test_plan_report_cases_are_live_catalog_names():
    """tools/plan_report.py asserts its CASES keys against CATALOG at
    import (r6 judge finding: four stale keys silently no-op'd after
    the consolidation) — importing it here makes that drift a test
    failure."""
    import importlib
    import os
    import sys

    tools_dir = os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools")
    sys.path.insert(0, tools_dir)
    try:
        plan_report = importlib.import_module("plan_report")
        from garden_net_backend_spark.queries import CATALOG

        assert all(n in CATALOG for n, _, _ in plan_report.CASES)
    finally:
        sys.path.remove(tools_dir)


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


def test_hot_load_map_is_emitted_and_self_attributing():
    """Judge r8 task 2: a headline whose best samples ran on a busy
    host must carry the per-query load so the record never again reads
    as a silent regression."""
    t = _timings(50)
    hot = {k: 9.17 for k in list(t)[:3]}
    line = render_bench_line(sum(t.values()), t, "0.1", hot=hot)
    parsed = json.loads(line)
    assert parsed["hot_load_at_best"] == {k: 9.2 for k in hot}
    # empty/None hot → key omitted, line identical to the legacy shape
    assert "hot_load_at_best" not in json.loads(
        render_bench_line(sum(t.values()), t, "0.1", hot={})
    )
    assert "hot_load_at_best" not in json.loads(
        render_bench_line(sum(t.values()), t, "0.1")
    )


def test_hot_load_map_compacts_before_precision_starves():
    """When every query ran hot on a shape near the size cap, the map
    degrades to a count+max summary rather than overflowing or eating
    the timing precision."""
    t = _timings(50)
    hot = {k: 11.3 for k in t}
    line = render_bench_line(sum(t.values()), t, "0.1", hot=hot)
    from bench import _MAX_LINE_CHARS

    assert len(line) <= _MAX_LINE_CHARS
    parsed = json.loads(line)
    hv = parsed["hot_load_at_best"]
    assert hv == {"_n_hot_best": 50, "_max_load": 11.3} or len(hv) == 50
    assert set(parsed["queries"]) == set(t)


def test_property_hot_map_never_breaks_the_line():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from bench import _MAX_LINE_CHARS

    keys = st.text(
        alphabet="abcdefghijklmnopqrstuvwxyz0123456789_", min_size=3, max_size=48
    )
    vals = st.floats(
        min_value=0.0, max_value=9999.0, allow_nan=False, allow_infinity=False
    )

    @settings(max_examples=100, deadline=None)
    @given(
        st.dictionaries(keys, vals, min_size=1, max_size=70),
        st.floats(min_value=4.0, max_value=99.0, allow_nan=False),
        st.data(),
    )
    def check(t, load, data):
        subset = {
            k: load
            for k in t
            if data.draw(st.booleans())
        }
        try:
            line = render_bench_line(sum(t.values()), t, "0.1", hot=subset)
        except AssertionError:
            return  # loud failure is the contract for hopeless shapes
        assert len(line) <= _MAX_LINE_CHARS
        assert set(json.loads(line)["queries"]) == set(t)

    check()


def test_cpus_field_echoed_and_optional():
    """Judge r13 task 2: the one-line JSON must echo the session's
    effective core count so the driver's scaling heuristic can see the
    $SPARK_GRAFT_CPUS ack in BENCH_r{N} itself (the r13
    ``suspect_cpus_ignored`` flag was a false positive because the ack
    lived only in BENCH_DETAIL.json)."""
    t = _timings(50)
    line = render_bench_line(sum(t.values()), t, "0.1", cpus=8)
    parsed = json.loads(line)
    assert parsed["cpus"] == 8
    assert len(line) <= _MAX_LINE_CHARS
    assert set(parsed["queries"]) == set(t)
    # cpus omitted when not passed (legacy shape stays parseable)
    assert "cpus" not in json.loads(render_bench_line(sum(t.values()), t, "0.1"))
    # main() passes it unconditionally
    import bench

    src = open(bench.__file__).read()
    assert "cpus=spark.sparkContext.defaultParallelism" in src


def test_signal_read_flags_loadavg_fallback(monkeypatch):
    """Advisor r11: a /proc parse failure silently switched units
    (1-min loadavg vs busy cores) with no marker — _signal_read now
    returns a per-read fallback flag and _SIGNAL counts them."""
    import bench

    v, fb = bench._signal_read(window=0.01)
    assert v >= 0.0 and fb is False
    monkeypatch.setattr(bench, "_host_cpu_jiffies", lambda: 1 / 0)
    before = bench._SIGNAL["fallbacks"]
    v2, fb2 = bench._signal_read(window=0.01)
    assert fb2 is True
    assert bench._SIGNAL["fallbacks"] == before + 1
    assert v2 >= 0.0  # loadavg value — unit-switched but gate-usable


def test_sample_load_ticker_collects():
    """Judge r11 task 6: the ticker samples sibling load DURING a
    window and summarizes max/mean/n; short windows still get >=1
    tick (the first read starts immediately)."""
    import time

    import bench

    tk = bench._SampleLoadTicker(interval=0.3).start()
    time.sleep(0.7)
    out = tk.stop()
    assert out is not None
    assert out["n"] >= 1
    assert out["max"] >= out["mean"] >= 0.0
