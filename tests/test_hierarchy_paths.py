"""Both physical paths of the iterative graph operators must agree: the
broadcast-hop loop (edge table ≤ BROADCAST_EDGE_ROW_LIMIT, what every
fixture-sized test exercises implicitly) and the explicit shuffle-join
path (broadcast_edges=False — the billion-edge configuration, otherwise
never taken at test scale)."""

from __future__ import annotations

from pyspark.sql import functions as F

from fhir_owl_spark.operators.hierarchy import (
    reachable_pairs,
    reachable_set,
    transitive_closure,
)


def _edges(spark):
    # 3-level fanout forest + one cross edge: 1 -> 10..13 -> 100..139
    rows = []
    for a in range(10, 14):
        rows.append((str(a), "1"))
        for b in range(a * 10, a * 10 + 10):
            rows.append((str(b), str(a)))
    rows.append(("100", "13"))  # diamond: 100 under both 10 and 13
    return spark.createDataFrame(rows, ["child", "parent"])


def test_closure_shuffle_path_equals_broadcast_path(spark):
    e = _edges(spark)
    kw = dict(child_col="child", parent_col="parent")
    bc = {(r["child"], r["parent"]) for r in transitive_closure(e, broadcast_edges=True, **kw).collect()}
    sh = {(r["child"], r["parent"]) for r in transitive_closure(e, broadcast_edges=False, **kw).collect()}
    assert bc == sh
    assert ("100", "1") in bc  # depth-2 through either diamond branch


def test_reachable_set_and_pairs_shuffle_path(spark):
    e = _edges(spark)
    for bcast in (True, False):
        anc = {
            r["node"]
            for r in reachable_set(e, ["100"], direction="up", broadcast_edges=bcast).collect()
        }
        assert anc == {"10", "13", "1"}
        pairs = {
            (r["seed"], r["node"])
            for r in reachable_pairs(
                e, ["100", "110"], direction="up", broadcast_edges=bcast
            ).collect()
        }
        assert pairs == {
            ("100", "10"), ("100", "13"), ("100", "1"),
            ("110", "11"), ("110", "1"),
        }
