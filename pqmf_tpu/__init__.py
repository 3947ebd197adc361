"""pqmf_tpu — TPU-native Pseudo-QMF filterbank + per-subband pitch-shifting
framework (JAX / XLA / Pallas).

A ground-up TPU rebuild of the capabilities of
oviniciuscesar/Pseudo-Quadrature-Mirror-Filter: PQMF analysis/synthesis
(classic + polyphase + streaming), phase-vocoder and resampling pitch
shifters applied per sub-band, block-streaming with explicit functional
state, export artifacts, and a conTorchionist-style method/attribute
registry — all as jit-compiled XLA programs with Pallas kernels on the hot
paths.
"""

from pqmf_tpu import design
from pqmf_tpu.filterbank import PQMF
from pqmf_tpu.pipelines import (
    PQMFPitchShiftWrapper,
    PQMFPitchShiftWrapperTA,
    PQMFWrapper,
    stream_ola,
)
from pqmf_tpu.shifters import (
    PhaseVocoderPitchShift,
    ResamplePitchShift,
    TorchaudioPitchShift,
)
from pqmf_tpu.streaming import StreamingPQMF

__version__ = "0.1.0"

__all__ = [
    "design",
    "PQMF",
    "StreamingPQMF",
    "PhaseVocoderPitchShift",
    "ResamplePitchShift",
    "TorchaudioPitchShift",
    "PQMFWrapper",
    "PQMFPitchShiftWrapper",
    "PQMFPitchShiftWrapperTA",
    "stream_ola",
    "__version__",
]
