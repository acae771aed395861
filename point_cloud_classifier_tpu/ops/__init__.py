from point_cloud_classifier_tpu.ops.fused_phi import (
    phi_forward_xla,
    phi_hidden_xla,
    phi_pool,
    phi_pool_pallas,
    phi_pool_xla,
)
from point_cloud_classifier_tpu.ops.knn import (
    adjacency_aggregate,
    knn_adjacency,
    knn_aggregate,
    knn_edges,
)
from point_cloud_classifier_tpu.ops.knn_pallas import knn_aggregate_pallas
from point_cloud_classifier_tpu.ops.segment import (
    counts_to_segment_ids,
    segment_count,
    segment_max,
    segment_mean,
    segment_rank_desc,
    segment_softmax,
    segment_sum,
    spread_by_segment,
)

__all__ = [
    "segment_sum",
    "segment_mean",
    "segment_max",
    "segment_count",
    "counts_to_segment_ids",
    "spread_by_segment",
    "segment_softmax",
    "segment_rank_desc",
    "phi_pool",
    "phi_pool_pallas",
    "phi_pool_xla",
    "phi_forward_xla",
    "phi_hidden_xla",
    "knn_edges",
    "knn_adjacency",
    "knn_aggregate",
    "adjacency_aggregate",
    "knn_aggregate_pallas",
]
