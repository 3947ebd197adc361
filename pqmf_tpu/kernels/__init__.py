"""Pallas TPU kernels for the PQMF hot paths (SURVEY.md §7 step 3).

The reference's compute kernels live inside ATen's conv1d (pqmf.py:129,
152); here they are hand-written Mosaic kernels that fuse the whole
analysis (phase de-interleave + polyphase matmul + alias-cancellation
sign mask) and synthesis (sign mask + matmul + band flip + gain + delay
trim + phase re-interleave) into single VMEM-resident passes: one HBM
read of the input and one HBM write of the output each.
"""

from pqmf_tpu.kernels.polyphase import (
    pallas_available,
    polyphase_analysis,
    polyphase_roundtrip,
    polyphase_synthesis,
    roundtrip_supported,
)

__all__ = ["polyphase_analysis", "polyphase_synthesis",
           "polyphase_roundtrip", "roundtrip_supported",
           "pallas_available"]
