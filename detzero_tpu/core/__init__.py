from detzero_tpu.core.config import Config, cfg, cfg_from_list, cfg_from_yaml_file, merge_new_config
from detzero_tpu.core.logger import create_logger, set_random_seed
from detzero_tpu.core.registry import (
    DATASETS,
    DETECTION_MODULES,
    MODELS,
    MOTION_FILTERS,
    REFINE_MODULES,
    Registry,
)

__all__ = [
    "Config", "cfg", "cfg_from_list", "cfg_from_yaml_file", "merge_new_config",
    "create_logger", "set_random_seed", "Registry",
    "DATASETS", "MODELS", "DETECTION_MODULES", "MOTION_FILTERS", "REFINE_MODULES",
]
