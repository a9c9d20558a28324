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
from .denoise import denoise, denoise_fixed, denoise_multilevel, threshold_coeffs
from .ops.thresholds import (
    apply_threshold,
    hard_threshold,
    mad_sigma,
    select_threshold,
    soft_threshold,
    universal_threshold,
)
from .padding import STRATEGIES as PADDING_STRATEGIES
from .padding import adaptive_strategy, pad_signal
from .ops.dwt import (
    DWTResult,
    WavedecResult,
    dwt,
    idwt,
    max_dwt_levels,
    wavedec,
    waverec,
)
from .transforms.modwt import MODWTResult, imodwt, modwt
from .transforms.multilevel import (
    MAX_DECOMPOSITION_LEVELS,
    MultiLevelMODWTResult,
    imodwt_multilevel,
    max_levels,
    modwt_multilevel,
)
from .transforms.cwt import (
    CWTConfig,
    CWTResult,
    ScaleSelectionConfig,
    cwt,
    estimate_scale_count,
    frequency_range_of_scales,
    frequency_to_scale,
    icwt,
    reconstruct_band,
    reconstruct_frequency_band,
    scale_to_frequency,
    scales_dyadic,
    scales_linear,
    scales_log,
    select_scales_adaptive,
    select_scales_optimal,
    select_scales_signal_adaptive,
)
from .transforms.swt import (
    SWTResult,
    apply_universal_threshold,
    extract_level,
    iswt,
    mra,
    swt,
    swt_denoise,
    threshold_level,
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

from . import cost_model, finance, kernels, observability, parallel, streaming
from .config import (
    TransformConfig,
    get_backend,
    get_fused_precision,
    set_backend,
    set_fused_precision,
)
from .ops.facade import get_performance_info
from .transforms.cwt_modwt_inverse import modwt_based_icwt

__all__ = [
    "streaming",
    "parallel",
    "kernels",
    "TransformConfig",
    "set_backend",
    "get_backend",
    "set_fused_precision",
    "get_fused_precision",
    "cost_model",
    "observability",
    "get_performance_info",
    "modwt_based_icwt",
    "cwt",
    "icwt",
    "CWTResult",
    "CWTConfig",
    "reconstruct_band",
    "reconstruct_frequency_band",
    "scale_to_frequency",
    "frequency_to_scale",
    "scales_linear",
    "scales_log",
    "scales_dyadic",
    "select_scales_optimal",
    "select_scales_signal_adaptive",
    "select_scales_adaptive",
    "ScaleSelectionConfig",
    "estimate_scale_count",
    "frequency_range_of_scales",
    "finance",
    "denoise",
    "denoise_fixed",
    "denoise_multilevel",
    "threshold_coeffs",
    "soft_threshold",
    "hard_threshold",
    "apply_threshold",
    "mad_sigma",
    "select_threshold",
    "universal_threshold",
    "swt",
    "iswt",
    "SWTResult",
    "swt_denoise",
    "threshold_level",
    "apply_universal_threshold",
    "extract_level",
    "mra",
    "pad_signal",
    "adaptive_strategy",
    "PADDING_STRATEGIES",
    "ErrorCode",
    "VectorWaveError",
    "InvalidArgumentError",
    "InvalidConfigurationError",
    "InvalidSignalError",
    "InvalidStateError",
    "DWTResult",
    "WavedecResult",
    "dwt",
    "idwt",
    "wavedec",
    "waverec",
    "max_dwt_levels",
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
