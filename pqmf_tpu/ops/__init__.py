from pqmf_tpu.ops import filterbank, phase_vocoder, resample, stft

__all__ = ["filterbank", "stft", "resample", "phase_vocoder"]
