"""Resampling ops. Implemented in the shifter milestone."""
