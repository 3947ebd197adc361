"""Measure-first probe for the streaming grouped handoff (VERDICT r2
item 9): how much of the flagship pitch-shift step would skipping the
analysis band re-interleave transpose actually save?

The fused round trip already keeps the kernels' grouped layout end-to-end
(fused_roundtrip_conv). For the PITCH-SHIFT pipeline the analogous move
is feeding ``strided_analysis_conv(out_layout="grouped")`` into the
band-STFT framing. The framing contracts n_fft consecutive band samples,
which in grouped layout are strided across (r, u) — absorbing that needs
a per-phase split of the DFT basis (G dots of n_fft/G contraction), same
FLOPs, so the ONLY saving is the re-interleave transpose itself. This
script times, in one window:

  a) the full flagship step (the number any saving is relative to);
  b) analysis with out_layout="bands" (transpose included);
  c) analysis with out_layout="grouped" (transpose skipped).

If (b) - (c) is under 10% of (a), the handoff cannot pay and is recorded
as a dead end (the verify skill keeps the ledger).

    python tools/ab_grouped_handoff.py
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from pqmf_tpu.kernels import cached_conv as cc
    from pqmf_tpu.pipelines import PQMFPitchShiftWrapper
    from pqmf_tpu.streaming import centered_padding
    from pqmf_tpu.utils.profiling import chained_ms

    print(f"platform: {jax.devices()[0].platform}")
    M, B = 16, 1
    w = PQMFPitchShiftWrapper(100, M, 8192, 44100)
    sp = w.pqmf
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, 1, 8192)).astype(np.float32)
                    * 0.1)
    Ka = sp.hkf.shape[-1]
    al, ar = centered_padding(Ka)
    xx = jnp.pad(x, ((0, 0), (0, 0), (al, ar)))
    pad_cols = xx.shape[-1] - 8192

    # (a) full step, state threaded through the chain. prev_tail must be
    # [M, overlap]: broadcast the probe signal into a per-band tail (a
    # [1, overlap] slice would silently broadcast band 0's tail to all M
    # bands — wrong state threading if copied into a correctness context)
    def step(v):
        tail = jnp.broadcast_to(v[0, 0, :w.band_overlap],
                                (M, w.band_overlap))
        state, y = w.pitchshift_fn({"prev_tail": tail}, v[:, :, :8192])
        out = jnp.concatenate(
            [y[:, None, :], jnp.zeros((B, 1, pad_cols), y.dtype)], -1)
        return out.at[:, 0, :w.band_overlap].set(
            state["prev_tail"][None, 0])

    # (b)/(c) analysis alone, bands vs grouped output layout
    def ana(layout):
        def f(v):
            y = cc.strided_analysis_conv(v, sp.hkf, M, out_layout=layout)
            return jnp.pad(
                y.reshape(B, 1, -1),
                ((0, 0), (0, 0), (0, xx.shape[-1] - y.shape[1] * y.shape[2])))
        return f

    for rep in range(3):
        a = chained_ms(step, xx, n=100, repeats=2)
        b = chained_ms(ana("bands"), xx, n=100, repeats=2)
        c = chained_ms(ana("grouped"), xx, n=100, repeats=2)
        save = b - c
        pct = 100.0 * save / a if a == a and a > 0 else float("nan")
        print(f"rep{rep}: full step {a:.4f} ms | analysis bands {b:.4f} "
              f"grouped {c:.4f} | transpose {save:.4f} ms = {pct:.1f}% "
              f"of step")


if __name__ == "__main__":
    main()
