"""Shared helpers for the CLI entry points."""

from __future__ import annotations


def install_finetuned_bank(wrapper, attenuation: int, n_band: int) -> str:
    """Install the committed fine-tuned bank matching ``(attenuation,
    n_band)`` on ``wrapper.pqmf`` (any of the three protocol wrappers)
    and return the bank name. The banks beat the Kaiser design's
    reconstruction on every bundled fixture — see
    :func:`pqmf_tpu.parallel.training.load_pretrained_bank` for numbers.
    Raises FileNotFoundError (naming the available banks) when no
    committed bank matches.
    """
    from pqmf_tpu.parallel.training import load_pretrained_bank
    from pqmf_tpu.streaming import kernels_from_params

    name = f"hk{n_band}_atten{attenuation}_finetuned"
    params = load_pretrained_bank(name)
    wrapper.pqmf.set_weights(params, *kernels_from_params(params))
    return name
