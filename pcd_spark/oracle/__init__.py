"""Pinned pure-numpy oracles — operationally "the reference semantics".

The reference checkout is a stub (/root/reference/README.md:1), so exact
per-vertex outputs (BASELINE.json north_rule) are only well-defined under a
pinned deterministic rule. These oracles ARE that rule for tests
(SURVEY.md §2 K4/K5 exactness note, §5.3).
"""

from pcd_spark.oracle.hits_numpy import hits_numpy  # noqa: F401
from pcd_spark.oracle.kmeans_numpy import kmeans_numpy  # noqa: F401
from pcd_spark.oracle.lpa_numpy import lpa_numpy  # noqa: F401
from pcd_spark.oracle.pagerank_numpy import pagerank_numpy  # noqa: F401
