"""CSR kernel path == DataFrame path (SURVEY.md §2 K2/J1, §4.3).

Both PageRank paths must agree to near machine precision, and both LPA paths
must agree exactly, at several partition counts (partition-invariance is part
of the determinism contract, SURVEY §5.3.3).
"""

from __future__ import annotations

import numpy as np
import pytest

from pcd_spark.graph import pagerank, label_propagation
from pcd_spark.graph.csr import pagerank_csr, label_propagation_csr
from tests.conftest import edges_df


@pytest.mark.parametrize("name,parts", [("karate", 4), ("directed_toy", 2), ("er_200", 8)])
def test_pagerank_csr_equals_dataframe_path(spark, graphs, name, parts):
    g = graphs[name]
    df = edges_df(spark, g["edges"])
    if not g["directed"]:
        df = df.unionByName(df.selectExpr("dst as src", "src as dst"))
    a = {r["vid"]: r["rank"] for r in pagerank(df, tol=1e-10).collect()}
    b = {r["vid"]: r["rank"] for r in pagerank_csr(df, tol=1e-10, num_parts=parts).collect()}
    assert set(a) == set(b)
    np.testing.assert_allclose(
        [a[v] for v in sorted(a)], [b[v] for v in sorted(a)], atol=1e-9
    )


@pytest.mark.parametrize("name,parts", [("karate", 4), ("er_200", 16), ("star_1001", 8)])
def test_lpa_csr_equals_dataframe_path(spark, graphs, name, parts):
    g = graphs[name]
    df = edges_df(spark, g["edges"])
    a = {r["vid"]: r["label"] for r in label_propagation(df, max_iter=20).collect()}
    b = {
        r["vid"]: r["label"]
        for r in label_propagation_csr(df, max_iter=20, num_parts=parts).collect()
    }
    assert a == b


def test_lpa_salted_equals_unsalted(spark, graphs):
    """C10: salting changes the physical plan only (star graph = max skew)."""
    g = graphs["star_1001"]
    df = edges_df(spark, g["edges"])
    a = {r["vid"]: r["label"] for r in label_propagation(df, max_iter=10).collect()}
    b = {
        r["vid"]: r["label"]
        for r in label_propagation(df, max_iter=10, salt_buckets=8).collect()
    }
    assert a == b
