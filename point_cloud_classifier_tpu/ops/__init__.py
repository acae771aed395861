from point_cloud_classifier_tpu.ops.segment import (
    segment_max,
    segment_mean,
    segment_rank_desc,
    segment_softmax,
    segment_sum,
)

__all__ = [
    "segment_sum",
    "segment_mean",
    "segment_max",
    "segment_softmax",
    "segment_rank_desc",
]
