"""vectorwave_tpu — a TPU-native wavelet transform engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
MorphIQ-Labs/VectorWave (reference mounted read-only at /root/reference):
MODWT/SWT/CWT analysis + synthesis for arbitrary-length signals, the full
wavelet registry, wavelet denoising, streaming transforms and financial
analysis — built TPU-first: functional transforms over ``[..., N]`` arrays,
à trous convolutions as fused XLA/Pallas passes, batch parallelism via
sharded leading axes, and long-signal tiling via ``shard_map`` halo exchange.
"""

from .errors import (
    ErrorCode,
    InvalidArgumentError,
    InvalidConfigurationError,
    InvalidSignalError,
    InvalidStateError,
    VectorWaveError,
)
from .transforms.modwt import MODWTResult, imodwt, modwt
from .transforms.multilevel import (
    MAX_DECOMPOSITION_LEVELS,
    MultiLevelMODWTResult,
    imodwt_multilevel,
    max_levels,
    modwt_multilevel,
)
from .wavelets.base import (
    ContinuousWavelet,
    DiscreteWavelet,
    TransformType,
    Wavelet,
    WaveletType,
)
from .wavelets.registry import (
    as_wavelet,
    available_wavelets,
    is_compatible,
    recommended_transform,
    register_wavelet,
    supported_transforms,
    wavelet,
    wavelets_in_family,
    wavelets_of_type,
)

__version__ = "0.1.0"

__all__ = [
    "ErrorCode",
    "VectorWaveError",
    "InvalidArgumentError",
    "InvalidConfigurationError",
    "InvalidSignalError",
    "InvalidStateError",
    "MODWTResult",
    "MultiLevelMODWTResult",
    "MAX_DECOMPOSITION_LEVELS",
    "modwt",
    "imodwt",
    "modwt_multilevel",
    "imodwt_multilevel",
    "max_levels",
    "DiscreteWavelet",
    "ContinuousWavelet",
    "Wavelet",
    "WaveletType",
    "TransformType",
    "wavelet",
    "as_wavelet",
    "available_wavelets",
    "register_wavelet",
    "wavelets_of_type",
    "wavelets_in_family",
    "supported_transforms",
    "is_compatible",
    "recommended_transform",
    "__version__",
]
