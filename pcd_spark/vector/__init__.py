from pcd_spark.vector.kmeans import kmeans  # noqa: F401
