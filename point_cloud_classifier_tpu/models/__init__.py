from point_cloud_classifier_tpu.models.fully_connected_net import FullyConnectedNet
from point_cloud_classifier_tpu.models.deep_sets import DeepSets
from point_cloud_classifier_tpu.models.graph_net import GraphNet
from point_cloud_classifier_tpu.models.logistic_regression import LogRegression
from point_cloud_classifier_tpu.models.wrapper import ModelWrapper

__all__ = [
    "FullyConnectedNet",
    "DeepSets",
    "GraphNet",
    "LogRegression",
    "ModelWrapper",
]
