"""torch-compatible STFT/ISTFT in JAX. Implemented in the shifter milestone."""
