from pqmf_tpu.utils import audio

__all__ = ["audio"]
