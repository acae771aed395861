from point_cloud_classifier_tpu.data.tabular import Step2PointTabular
from point_cloud_classifier_tpu.data.pointcloud import Step2PointPointCloud
from point_cloud_classifier_tpu.data.graph import Step2PointGraph

__all__ = ["Step2PointTabular", "Step2PointPointCloud", "Step2PointGraph"]
