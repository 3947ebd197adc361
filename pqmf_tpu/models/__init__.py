"""Model families — the deployable processing modules.

The reference's "models" are its three exported TorchScript wrappers
(PQMFWrapper.py:17-92, 1-PitchShifterWrapper.py:104-323,
PQMFPsWrapper.py:31-150); here they live in :mod:`pqmf_tpu.pipelines`
(pure-functional pipelines) and are re-exported under ``models`` for the
conventional layout, together with the trainable filterbank.
"""

from pqmf_tpu.parallel.training import TrainablePQMF
from pqmf_tpu.pipelines import (
    PQMFPitchShiftWrapper,
    PQMFPitchShiftWrapperTA,
    PQMFWrapper,
)

__all__ = [
    "PQMFWrapper",
    "PQMFPitchShiftWrapper",
    "PQMFPitchShiftWrapperTA",
    "TrainablePQMF",
]
