from seedvc_tpu.core.config import (  # noqa: F401
    DiTConfig,
    LengthRegulatorConfig,
    ModelParams,
    PreprocessConfig,
    SeedVCConfig,
    SpectConfig,
    TrainConfig,
    WavenetConfig,
    get_preset,
    load_preset,
)
from seedvc_tpu.core.utils import sequence_mask  # noqa: F401
