from adfmsl.config.base import (
    ArchitectureConfig,
    DataConfig,
    ExperimentConfig,
    FMSLConfig,
    FrontendConfig,
    LossConfig,
    MeshConfig,
    ModelConfig,
    OptimizerConfig,
    SpecAugmentConfig,
    TrainConfig,
    Wav2Vec2Config,
)
from adfmsl.config.standardized import (
    ALL_MODELS,
    BASELINE_MODELS,
    EXTRA_MODELS,
    FMSL_MODELS,
    get_standardized_config,
    make_experiment,
)
from adfmsl.config.yaml_io import load_reference_yaml, load_yaml, save_yaml
from adfmsl.config.verify import verify_all

__all__ = [
    "ArchitectureConfig", "DataConfig", "ExperimentConfig", "FMSLConfig",
    "FrontendConfig", "LossConfig", "MeshConfig", "ModelConfig", "OptimizerConfig",
    "SpecAugmentConfig", "TrainConfig", "Wav2Vec2Config",
    "ALL_MODELS", "BASELINE_MODELS", "EXTRA_MODELS", "FMSL_MODELS",
    "get_standardized_config", "make_experiment", "load_yaml", "load_reference_yaml", "save_yaml", "verify_all",
]
