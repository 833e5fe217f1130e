from pcd_spark.vector.kmeans import kmeans  # noqa: F401
from pcd_spark.vector.pq import pq_encode, pq_topk, train_pq  # noqa: F401
