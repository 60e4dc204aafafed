from ovr_tpu.core.scene import (
    Camera,
    Light,
    Scene,
    StructuredVolume,
    TransferFunction,
    simple_scene,
)
from ovr_tpu.core.types import ValueType, integer_normalize, normalize_array
