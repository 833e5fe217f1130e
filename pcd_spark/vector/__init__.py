from pcd_spark.vector.kmeans import kmeans  # noqa: F401
from pcd_spark.vector.pq import (  # noqa: F401
    ivfpq_topk,
    pq_encode,
    pq_topk,
    train_pq,
)
