from pcd_spark.relational.queries import REGISTRY as _CORE
from pcd_spark.relational.textops import REGISTRY as _TEXT
from pcd_spark.relational.graph_queries import REGISTRY as _GRAPH

#: name -> {"spark": fn(spark, sf_dir) -> DataFrame, "sql": str | None}
REGISTRY: dict = {**_CORE, **_TEXT, **_GRAPH}
