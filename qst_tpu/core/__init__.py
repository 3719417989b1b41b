from qst_tpu.core.config import (
    LossConfig,
    EncoderConfig,
    DataConfig,
    TrainConfig,
    IREvalConfig,
    MeshConfig,
    ExperimentConfig,
    config_hash,
    save_config,
    load_config,
)
from qst_tpu.core.meshes import make_mesh, dtype_policy, DTypePolicy, enable_compilation_cache
from qst_tpu.core.rng import RngStream, seed_everything
from qst_tpu.core.telemetry import CsvSink, JsonLogSink, StepTimer

__all__ = [
    "LossConfig",
    "EncoderConfig",
    "DataConfig",
    "TrainConfig",
    "IREvalConfig",
    "MeshConfig",
    "ExperimentConfig",
    "config_hash",
    "save_config",
    "load_config",
    "make_mesh",
    "enable_compilation_cache",
    "dtype_policy",
    "DTypePolicy",
    "RngStream",
    "seed_everything",
    "CsvSink",
    "JsonLogSink",
    "StepTimer",
]
