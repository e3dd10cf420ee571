"""Large-star/small-star CC equals min-label-propagation CC."""

import numpy as np
import pytest

from incremental_entity_extraction_spark.operators.clustering import (
    connected_components,
    connected_components_star,
)


def _partition(pdf):
    groups = {}
    for m, l in zip(pdf["mention_id"], pdf["cluster_label"]):
        groups.setdefault(l, set()).add(m)
    return sorted(map(sorted, groups.values()))


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_star_cc_equals_label_propagation(spark, seed):
    rng = np.random.default_rng(seed)
    n = 40
    vertices = spark.createDataFrame(
        [(f"v{i:03d}",) for i in range(n)], "mention_id string"
    )
    edges = [
        (f"v{int(a):03d}", f"v{int(b):03d}")
        for a, b in rng.integers(0, n, size=(30, 2))
        if a != b
    ]
    edf = spark.createDataFrame(edges or [("v000", "v001")], "src string, dst string")
    p1 = _partition(connected_components(vertices, edf).toPandas())
    p2 = _partition(connected_components_star(vertices, edf).toPandas())
    assert p1 == p2


def test_star_cc_long_chain(spark):
    """A path graph (worst case for label propagation) — star CC must still
    produce one component with the min label."""
    n = 30
    vertices = spark.createDataFrame(
        [(f"v{i:03d}",) for i in range(n)], "mention_id string"
    )
    edges = spark.createDataFrame(
        [(f"v{i:03d}", f"v{i + 1:03d}") for i in range(n - 1)],
        "src string, dst string",
    )
    out = connected_components_star(vertices, edges).toPandas()
    assert set(out["cluster_label"]) == {"v000"}


def test_propagation_raises_on_deep_chain_star_converges(spark):
    """A chain of 30 nodes has diameter 29: propagation with max_iter=5 must
    FAIL LOUDLY (no silent partial labels), while star-CC converges in
    O(log n) rounds and labels the whole chain with its minimum."""
    import pandas as pd
    import pytest

    n = 30
    edges_pdf = pd.DataFrame(
        {"src": [f"v{i:03d}" for i in range(n - 1)],
         "dst": [f"v{i+1:03d}" for i in range(n - 1)]}
    )
    verts_pdf = pd.DataFrame({"mention_id": [f"v{i:03d}" for i in range(n)]})
    edges = spark.createDataFrame(edges_pdf)
    vertices = spark.createDataFrame(verts_pdf)

    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(vertices, edges, max_iter=5)

    out = connected_components_star(vertices, edges, max_iter=10).toPandas()
    assert (out["cluster_label"] == "v000").all()
    assert len(out) == n


def test_small_graph_union_find_matches_star(spark):
    """The size-adaptive single-task union-find path must emit labels
    identical to the distributed star rounds on the same graph."""
    import random

    from pyspark.sql import functions as F

    from incremental_entity_extraction_spark.operators.clustering import (
        connected_components_star,
    )

    rng = random.Random(17)
    nodes = [f"m{i:04d}" for i in range(400)]
    # chains + cliques + singletons
    edges = [(nodes[i], nodes[i + 1]) for i in range(0, 120, 1)]
    edges += [(nodes[200 + i], nodes[200 + j]) for i in range(8) for j in range(i)]
    edges += [(rng.choice(nodes[:300]), rng.choice(nodes[:300])) for _ in range(50)]
    v = spark.createDataFrame([(n,) for n in nodes], "mention_id string")
    e = spark.createDataFrame(edges, "src string, dst string")

    small = connected_components_star(v, e)  # default: union-find path
    star = connected_components_star(v, e, small_graph_edges=0)  # force star
    a = {r["mention_id"]: r["cluster_label"] for r in small.collect()}
    b = {r["mention_id"]: r["cluster_label"] for r in star.collect()}
    assert a == b
    # label = min member, singletons label themselves
    assert a["m0399"] == "m0399"
    assert a["m0000"] == "m0000" and a["m0120"] == "m0000"


def test_union_find_empty_edges(spark):
    from incremental_entity_extraction_spark.operators.clustering import (
        connected_components_star,
    )

    v = spark.createDataFrame([("a",), ("b",)], "mention_id string")
    e = spark.createDataFrame([], "src string, dst string")
    got = {r["mention_id"]: r["cluster_label"]
           for r in connected_components_star(v, e).collect()}
    assert got == {"a": "a", "b": "b"}
