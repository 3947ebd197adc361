"""Vectorized phase-vocoder time stretch. Implemented in the shifter milestone."""
