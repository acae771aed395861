from point_cloud_classifier_tpu.data.module import DataModule
from point_cloud_classifier_tpu.data.tabular import Step2PointTabular
from point_cloud_classifier_tpu.data.pointcloud import Step2PointPointCloud
from point_cloud_classifier_tpu.data.graph import Step2PointGraph
from point_cloud_classifier_tpu.data.batching import (
    GraphLoader,
    PointCloudLoader,
    TabularLoader,
)
from point_cloud_classifier_tpu.data.background import BackgroundIterator
from point_cloud_classifier_tpu.data.prefetch import prefetch_to_device
from point_cloud_classifier_tpu.data.resident import ResidentCache
from point_cloud_classifier_tpu.data.synthetic import (
    write_shower_file,
    write_synthetic_dataset,
)

__all__ = [
    "DataModule",
    "Step2PointTabular",
    "Step2PointPointCloud",
    "Step2PointGraph",
    "TabularLoader",
    "PointCloudLoader",
    "GraphLoader",
    "BackgroundIterator",
    "prefetch_to_device",
    "ResidentCache",
    "write_synthetic_dataset",
    "write_shower_file",
]
