#!/usr/bin/env python
"""spark-submit entry point (BASELINE.json:6 "run via spark-submit --py-files").

Usage:
    zip -r /tmp/pcd_spark.zip pcd_spark
    spark-submit --master local[8] --py-files /tmp/pcd_spark.zip \\
        scripts/submit_job.py --algo pagerank --snap graph.txt --out /tmp/out

The module arrives via --py-files (no repo on the executors' PYTHONPATH),
which is exactly the multi-executor deployment shape; the driver resolves
pcd_spark from the shipped zip.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--algo", required=True,
                    choices=["pagerank", "cc", "lpa", "triangles", "kcore",
                             "modularity", "lcc", "sssp", "louvain", "hits",
                             "scc", "hyperball", "harmonic", "betweenness",
                             "ktruss", "coreness", "mis", "projection",
                             "butterflies", "coloring", "katz", "condense",
                             "scan", "local-community", "matching",
                             "coarsen", "densest", "msf", "leiden",
                             "onion", "constraint", "closeness",
                             "landmarks", "temporal-reach", "simrank"])
    ap.add_argument("--snap", required=True, help="SNAP edge-list text file")
    ap.add_argument("--out", required=True, help="output parquet dir")
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument("--max-iter", type=int, default=50)
    ap.add_argument("--k", type=int, default=3,
                    help="k for --algo kcore / ktruss; max hops for "
                         "--algo temporal-reach")
    ap.add_argument("--n-samples", type=int, default=16,
                    help="sampled sources for --algo betweenness")
    ap.add_argument("--source", type=int, action="append", default=None,
                    help="source vertex for --algo sssp or personalized pagerank (repeatable)")
    ap.add_argument("--max-vertices", type=int, default=20_000,
                    help="vertex-count guard for --algo simrank: SimRank "
                         "state is O(V^2)-dense by construction, so the CLI "
                         "refuses graphs above this bound instead of blowing "
                         "up state/runtime — run it on an ego/cohort "
                         "subgraph (the library docstring's design point) "
                         "or raise this knob deliberately")
    args = ap.parse_args()

    # SparkSession comes from spark-submit; imports resolve from --py-files
    from pyspark.sql import SparkSession

    from pcd_spark.graph import (
        betweenness_centrality,
        katz_centrality,
        bipartite_projection,
        butterfly_counts,
        coreness,
        greedy_coloring,
        maximal_independent_set,
        connected_components,
        harmonic_centrality,
        hits,
        hyperball,
        k_core,
        k_truss,
        label_propagation,
        local_clustering,
        louvain,
        modularity_terms,
        pagerank,
        read_snap_edges,
        shortest_paths,
        strongly_connected_components,
        triangle_counts,
    )
    from pcd_spark.storage import CheckpointStore

    spark = SparkSession.builder.getOrCreate()
    edges = read_snap_edges(spark, args.snap)

    store = None
    if args.checkpoint_dir:
        store = CheckpointStore(args.checkpoint_dir, args.algo, run_id="submit")

    stats: dict = {}
    if args.algo == "pagerank":
        sym = edges.unionByName(edges.selectExpr("dst as src", "src as dst"))
        res = pagerank(sym, max_iter=args.max_iter, store=store,
                       stats_out=stats, sources=args.source or None)
    elif args.algo == "cc":
        res = connected_components(edges, max_iter=args.max_iter, store=store,
                                   stats_out=stats)
    elif args.algo == "lpa":
        res = label_propagation(edges, max_iter=args.max_iter, store=store,
                                stats_out=stats)
    elif args.algo == "kcore":
        res = k_core(edges, k=args.k, max_iter=args.max_iter, store=store,
                     stats_out=stats)
    elif args.algo == "modularity":
        # score the LPA partition of the input graph (the standard report)
        labels = label_propagation(edges, max_iter=args.max_iter, store=store,
                                   stats_out=stats)
        res = modularity_terms(edges, labels)
    elif args.algo == "lcc":
        res = local_clustering(edges)
    elif args.algo == "louvain":
        res = louvain(edges, max_levels=args.max_iter, stats_out=stats)
    elif args.algo == "sssp":
        if not args.source:
            ap.error("--algo sssp requires at least one --source")
        res = shortest_paths(edges, args.source, max_iter=args.max_iter,
                             store=store, stats_out=stats)
    elif args.algo == "katz":
        from pcd_spark.graph.edges import symmetrize

        res = katz_centrality(symmetrize(edges), alpha=None,
                              max_iter=args.max_iter, store=store,
                              stats_out=stats)
    elif args.algo == "hits":
        res = hits(edges, max_iter=args.max_iter, store=store, stats_out=stats)
    elif args.algo == "scc":
        res = strongly_connected_components(edges, max_iter=args.max_iter,
                                            stats_out=stats)
    elif args.algo == "condense":
        from pcd_spark.graph import topological_levels

        res = topological_levels(edges, max_iter=args.max_iter,
                                 stats_out=stats)
    elif args.algo == "hyperball":
        res = hyperball(edges, max_iter=args.max_iter, store=store,
                        stats_out=stats)
    elif args.algo == "harmonic":
        res = harmonic_centrality(edges, max_iter=args.max_iter, store=store,
                                  stats_out=stats)
    elif args.algo == "betweenness":
        res = betweenness_centrality(edges, n_samples=args.n_samples,
                                     sources=args.source or None,
                                     max_iter=args.max_iter, stats_out=stats)
    elif args.algo == "ktruss":
        res = k_truss(edges, k=args.k, max_iter=args.max_iter,
                      stats_out=stats)
    elif args.algo == "coreness":
        res = coreness(edges, max_iter=args.max_iter, store=store,
                       stats_out=stats)
    elif args.algo == "mis":
        res = maximal_independent_set(edges, max_iter=args.max_iter,
                                      store=store, stats_out=stats)
    elif args.algo == "scan":
        from pcd_spark.graph import scan_similarity

        res = scan_similarity(edges)
    elif args.algo == "matching":
        from pcd_spark.graph import maximal_matching

        res = maximal_matching(edges, max_iter=args.max_iter,
                               store=store, stats_out=stats)
    elif args.algo == "coarsen":
        from pcd_spark.graph import coarsen_graph, maximal_matching

        m = maximal_matching(edges, max_iter=args.max_iter,
                             store=store, stats_out=stats)
        res = coarsen_graph(edges, m)
    elif args.algo == "densest":
        from pcd_spark.graph import densest_subgraph

        res = densest_subgraph(edges, max_iter=args.max_iter,
                               stats_out=stats)
    elif args.algo == "msf":
        from pcd_spark.graph import minimum_spanning_forest

        res = minimum_spanning_forest(edges, stats_out=stats)
    elif args.algo == "leiden":
        from pcd_spark.graph import leiden

        res = leiden(edges, max_levels=args.max_iter, stats_out=stats)
    elif args.algo == "onion":
        from pcd_spark.graph import onion_layers

        res = onion_layers(edges, stats_out=stats)
    elif args.algo == "constraint":
        from pcd_spark.graph import burt_constraint

        res = burt_constraint(edges)
    elif args.algo == "simrank":
        from pcd_spark.graph import simrank

        # fail fast before building O(V^2) pair state on an unbounded input
        n_v = (
            edges.selectExpr("src as vid")
            .unionByName(edges.selectExpr("dst as vid"))
            .distinct()
            .count()
        )
        if n_v > args.max_vertices:
            raise SystemExit(
                f"--algo simrank: graph has {n_v} vertices, above the "
                f"--max-vertices guard ({args.max_vertices}). SimRank pair "
                "state is O(V^2)-dense; extract an ego/cohort subgraph "
                "first, or raise --max-vertices deliberately."
            )
        res = simrank(edges, max_iter=args.max_iter, eps=1e-4,
                      stats_out=stats)
    elif args.algo == "closeness":
        from pcd_spark.graph import closeness_centrality

        if not args.source:
            raise SystemExit("--algo closeness requires --source (repeatable)")
        res = closeness_centrality(edges, args.source,
                                   max_iter=args.max_iter, stats_out=stats)
    elif args.algo == "landmarks":
        from pcd_spark.graph import landmark_distances

        if not args.source:
            raise SystemExit("--algo landmarks requires --source (repeatable)")
        res = landmark_distances(edges, args.source,
                                 max_iter=args.max_iter, store=store,
                                 stats_out=stats)
    elif args.algo == "temporal-reach":
        from pcd_spark.graph import temporal_reachability
        from pcd_spark.graph.edges import read_snap_temporal_edges

        if not args.source:
            raise SystemExit("--algo temporal-reach requires --source")
        inter = read_snap_temporal_edges(spark, args.snap)
        res = temporal_reachability(inter, args.source,
                                    max_hops=args.k, stats_out=stats)
    elif args.algo == "local-community":
        from pcd_spark.graph import local_community

        if not args.source:
            raise SystemExit("--algo local-community requires --source <vid>")
        res = local_community(edges, seed=args.source[0], stats_out=stats)
    elif args.algo == "projection":
        # input treated as bipartite (src = center, dst = side)
        res = bipartite_projection(edges)
    elif args.algo == "butterflies":
        res = butterfly_counts(edges)
    elif args.algo == "coloring":
        res = greedy_coloring(edges, max_iter=args.max_iter, store=store,
                              stats_out=stats)
    else:
        res = triangle_counts(edges)

    res.write.mode("overwrite").parquet(args.out)
    out = {
        "algo": args.algo,
        "rows": spark.read.parquet(args.out).count(),
        "iterations": stats.get("iterations"),
    }
    if "q" in stats:  # louvain reports final modularity + per-level shape
        out["q"] = stats["q"]
        out["levels"] = len(stats.get("levels", []))
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
