"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship: derive the customer–supplier interaction graph from
                sf0.001, run PageRank + label propagation through the engine,
                report communities (size, mean/max rank).
queries()     — one entry per implemented operator from SURVEY.md §2
                (relational surface B–H incl. the C12–C14 subquery forms,
                E8/G5, H11/H12 generators, D15 heavy hitters, streaming
                batch twins, text/dedup/similarity/vector ops X1–X34 /
                V1–V18 incl. X29 chunking, X30 semantic decontamination,
                X31 LSH calibration, X32 per-source caps, X33 winnowing
                fingerprints, X34 Zipf fit, V16 k-center coreset, V17 embedding
                audit and V18 IVF nprobe sweep, multimodal, graph algorithms K1–K61
                incl. K50 Leiden, K53 3-clique percolation, K54 temporal
                reachability, K55 closeness via batched landmark BFS, K56
                double-sweep diameter, K57 landmark distance estimation,
                K58 SimRank, K59 disparity backbone, K60 edge
                burstiness and K61 weighted clustering), each
                (spark, sf_dir) -> DataFrame.
oracle_sql()  — DuckDB-equivalent ANSI SQL per query where expressible;
                iterative-to-convergence algorithms (PageRank/LPA) and the
                synthesized-corpus pipeline are rows-only by design — their
                exactness is pinned by numpy/networkx oracles in tests/.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pcd_spark.relational import REGISTRY  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship on /root/testdata/sf0.001: graph derivation -> PageRank +
    LPA -> community report. Driver checks rows > 0, stable schema."""
    from pcd_spark.graph import label_propagation, pagerank
    from pcd_spark.relational.graph_queries import cust_supp_edges

    sf = "/root/testdata/sf0.001"
    e = cust_supp_edges(spark, sf)
    sym = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    pr = pagerank(sym, tol=1e-8)
    labels = label_propagation(e, max_iter=20)
    return (
        labels.join(pr, "vid")
        .groupBy("label")
        .agg(
            F.count("*").alias("community_size"),
            F.round(F.avg("rank"), 8).alias("mean_rank"),
            F.round(F.max("rank"), 8).alias("max_rank"),
        )
        .orderBy(F.desc("community_size"), F.asc("label"))
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: entry_["spark"] for name, entry_ in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: e["sql"] for name, e in REGISTRY.items() if e["sql"]}
