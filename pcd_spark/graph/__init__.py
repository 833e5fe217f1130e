from pcd_spark.graph.partition import partition_edges, degrees  # noqa: F401
from pcd_spark.graph.edges import (  # noqa: F401
    read_snap_edges,
    symmetrize,
    canonical_undirected,
)
from pcd_spark.graph.pagerank import pagerank  # noqa: F401
from pcd_spark.graph.cc import connected_components  # noqa: F401
from pcd_spark.graph.lpa import label_propagation  # noqa: F401
from pcd_spark.graph.triangles import (  # noqa: F401
    approx_triangle_total,
    triangle_counts,
    triangle_list,
)
from pcd_spark.graph.quality import (  # noqa: F401
    burt_constraint,
    conductance_terms,
    local_clustering,
    modularity,
    modularity_terms,
    scan_similarity,
)
from pcd_spark.graph.kcore import coreness, k_core, onion_layers  # noqa: F401
from pcd_spark.graph.bipartite import (  # noqa: F401
    bipartite_projection,
    butterfly_counts,
    butterfly_total,
)
from pcd_spark.graph.louvain import louvain  # noqa: F401
from pcd_spark.graph.leiden import leiden  # noqa: F401
from pcd_spark.graph.sssp import (  # noqa: F401
    closeness_centrality,
    landmark_distances,
    shortest_paths,
)
from pcd_spark.graph.temporal import temporal_reachability  # noqa: F401
from pcd_spark.graph.hits import hits  # noqa: F401
from pcd_spark.graph.linkpred import (  # noqa: F401
    degree_assortativity,
    link_prediction,
    simrank,
)
from pcd_spark.graph.walks import random_walks  # noqa: F401
from pcd_spark.graph.features import neighbor_feature_agg  # noqa: F401
from pcd_spark.graph.scc import strongly_connected_components  # noqa: F401
from pcd_spark.graph.hyperball import (  # noqa: F401
    harmonic_centrality,
    hyperball,
    neighborhood_function,
)
from pcd_spark.graph.betweenness import betweenness_centrality  # noqa: F401
from pcd_spark.graph.truss import k_truss  # noqa: F401
from pcd_spark.graph.eigen import eigenvector_centrality  # noqa: F401
from pcd_spark.graph.katz import katz_centrality  # noqa: F401
from pcd_spark.graph.mis import maximal_independent_set  # noqa: F401
from pcd_spark.graph.coloring import greedy_coloring  # noqa: F401
from pcd_spark.graph.condense import condensation, topological_levels  # noqa: F401
from pcd_spark.graph.nibble import local_community  # noqa: F401
from pcd_spark.graph.matching import maximal_matching, coarsen_graph  # noqa: F401
from pcd_spark.graph.densest import densest_subgraph  # noqa: F401
from pcd_spark.graph.msf import minimum_spanning_forest  # noqa: F401
from pcd_spark.graph.percolation import clique_percolation  # noqa: F401
