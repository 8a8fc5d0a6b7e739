"""S12 HTTP-result cache: key covers ALL result-shaping params
(fixing the reference's search|organism|cell_type key, SURVEY §4),
round-trip through serve_search, sentinel caching, eviction."""

import json
import tempfile

from garden_net_backend_spark.plans.network_build import build_network
from garden_net_backend_spark.plans.search import build_token_index
from garden_net_backend_spark.plans.serving import (
    ResultCache,
    cache_key,
    serve_search,
)


def _network(spark):
    rows = []
    for c in ["1", "2"]:
        for i in range(5):
            rows.append(
                (c, i * 1000, i * 1000 + 500, i, f"Gene{c}{i}",
                 c, (i + 1) * 1000, (i + 1) * 1000 + 500, i + 100, ".",
                 1000.0, 9.0)
            )
    inter = spark.createDataFrame(
        rows,
        "baitChr string, baitStart long, baitEnd long, baitID long,"
        "baitName string, oeChr string, oeStart long, oeEnd long,"
        "oeID long, oeName string, dist double, score double",
    )
    return build_network(inter, wt_threshold=5.0)


def test_cache_key_covers_nearest_and_expand():
    base = cache_key("6:52155590-52158317", "Mus_musculus", "ESC")
    # the reference bug: these three collide under search|organism|cell_type
    assert base != cache_key("6:52155590-52158317", "Mus_musculus", "ESC",
                             expand=20000)
    assert base != cache_key("6:52155590-52158317", "Mus_musculus", "ESC",
                             nearest=True)
    # and key is stable
    assert base == cache_key("6:52155590-52158317", "Mus_musculus", "ESC")


def test_result_cache_roundtrip_and_eviction(tmp_path):
    c = ResultCache(str(tmp_path / "cache"))
    k = cache_key("Hoxa6", "Mus_musculus", "ESC")
    assert c.get(k) is None
    c.put(k, '{"elements": []}')
    assert c.get(k) == '{"elements": []}'
    c.put(k, '{"elements": [1]}')  # overwrite wins
    assert c.get(k) == '{"elements": [1]}'
    c.evict(k)
    assert c.get(k) is None


def test_serve_search_memoizes(spark):
    nodes, edges = _network(spark)
    cache = ResultCache(tempfile.mkdtemp(prefix="rescache_"))
    idx = build_token_index(nodes)
    out1, hit1 = serve_search(cache, nodes, edges, "Gene12",
                              cell_type="ESC", token_index=idx)
    assert not hit1
    payload = json.loads(out1)
    assert any(
        el["data"].get("searched") == "true" for el in payload["elements"]
        if el["group"] == "nodes"
    )
    out2, hit2 = serve_search(cache, nodes, edges, "Gene12",
                              cell_type="ESC", token_index=idx)
    assert hit2 and out2 == out1
    # different expand → different key → miss (the reference bug fixed)
    _, hit3 = serve_search(cache, nodes, edges, "Gene12",
                           cell_type="ESC", expand=5000, token_index=idx)
    assert not hit3
    # the cache is queryable as a table
    rows = {r["key"] for r in cache.as_dataframe(spark).collect()}
    assert cache_key("Gene12", "", "ESC") in rows


def test_empty_sentinel_cached(spark):
    nodes, edges = _network(spark)
    cache = ResultCache(tempfile.mkdtemp(prefix="rescache_"))
    out, hit = serve_search(cache, nodes, edges, "NoSuchGeneXYZ",
                            token_index=build_token_index(nodes))
    assert out == "{}" and not hit
    out2, hit2 = serve_search(cache, nodes, edges, "NoSuchGeneXYZ",
                              token_index=build_token_index(nodes))
    assert out2 == "{}" and hit2
