from point_cloud_classifier_tpu.utils.config import load_config, merge_dicts, save_config
from point_cloud_classifier_tpu.utils.jit_cache import enable_compile_cache
from point_cloud_classifier_tpu.utils.log import TrainingLogger

__all__ = ["load_config", "merge_dicts", "save_config", "TrainingLogger"]
