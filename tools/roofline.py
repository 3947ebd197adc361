"""Per-kernel roofline table for the four Pallas kernels (VERDICT r1 #9).

Times each kernel with chained on-chip measurement (utils.profiling) at
the default config and prints bytes moved, MXU FLOPs, achieved GB/s and
GFLOP/s. Run twice in one window for A/B when comparing kernel changes —
the chip is co-tenanted (~3x swings between windows, see the verify
skill), so only same-window comparisons are meaningful.

    JAX_COMPILATION_CACHE_DIR=/root/.cache/jaxcomp python tools/roofline.py [--seconds 60]
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=60.0)
    ap.add_argument("--chain", type=int, default=50)
    ap.add_argument("--atten", type=int, default=100)
    ap.add_argument("--n_band", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pqmf_tpu.kernels import cached_conv as cc
    from pqmf_tpu.kernels import polyphase as pk
    from pqmf_tpu.ops import filterbank as fb
    from pqmf_tpu.streaming import StreamingPQMF
    from pqmf_tpu.utils.profiling import chained_ms, dispatch_floor_ms

    M = args.n_band
    SR = 44100
    T = int(args.seconds * SR) // M * M
    params = fb.build_filterbank(args.atten, M)
    sp = StreamingPQMF(args.atten, M)

    rng = np.random.default_rng(0)
    x_raw = jnp.asarray(rng.standard_normal((1, 1, T)).astype(np.float32))
    x_sub = jnp.asarray(
        rng.standard_normal((1, M, T // M)).astype(np.float32))

    print(f"platform={jax.devices()[0].platform}  T={T} ({args.seconds}s "
          f"@44.1k)  M={M}  dispatch_floor={dispatch_floor_ms():.1f} ms")

    L = params["hk_poly"].shape[-1]
    Ka = sp.hkf.shape[-1]
    Ks = sp.hki.shape[-1]

    # every case carries a [1, 1, T] f32 buffer through the kernel (the
    # reshapes are free) so the chained fori_loop cannot dead-code it
    f32 = 4
    shape = (1, 1, T)
    cases = [
        ("polyphase_analysis (fused mask)",
         lambda v: pk.polyphase_analysis(
             v.reshape(shape), params["hk_poly"]).reshape(shape),
         2 * T * f32, 2 * (T // M) * M * (L * M)),
        ("polyphase_synthesis (fused)",
         lambda v: pk.polyphase_synthesis(
             v.reshape(1, M, T // M), params["hk_ipoly"]).reshape(shape),
         2 * T * f32, 2 * (T // M) * M * (L * M)),
        ("cached analysis (k=513 s=16)",
         lambda v: sp.forward(v.reshape(shape)).reshape(shape),
         2 * T * f32, 2 * (T // M) * M * (-(-Ka // M) * M)),
        ("cached synthesis (k=33 s=1)",
         lambda v: sp.inverse(v.reshape(1, M, T // M)).reshape(shape),
         2 * T * f32, 2 * (T // M) * M * (Ks * M)),
        ("full roundtrip (cached offline)",
         lambda v: sp.inverse(sp.forward(v.reshape(shape))).reshape(shape),
         4 * T * f32,
         2 * (T // M) * M * (-(-Ka // M) * M) + 2 * (T // M) * M * (Ks * M)),
        ("fused roundtrip (grouped pass-through)",
         lambda v: sp.roundtrip(v.reshape(shape)).reshape(shape),
         2 * T * f32,
         2 * (T // M) * M * (-(-Ka // M) * M) + 2 * (T // M) * M * (Ks * M)),
    ]

    print(f"{'kernel':34s} {'ms':>8s} {'GB/s':>8s} {'GFLOP/s':>9s} "
          f"{'ms/60s-audio':>12s}")
    conv_gfs = []
    for name, fn, nbytes, flops in cases:
        ms = chained_ms(fn, x_raw, n=args.chain)
        gbs = nbytes / (ms * 1e-3) / 1e9
        gfs = flops / (ms * 1e-3) / 1e9
        per60 = ms * (60.0 / args.seconds)
        conv_gfs.append(gfs)
        print(f"{name:34s} {ms:8.3f} {gbs:8.1f} {gfs:9.1f} {per60:12.3f}")

    # --- serving steps (VERDICT r3 item 3): the flagship fused
    # pitchshift step and the fused TA step, with the same bytes/FLOPs
    # accounting as the conv rows. FLOPs count the matmul work (convs,
    # DFT/IDFT bases, one-hot frame selects, one-hot/banded resample);
    # VPU elementwise (atan2/cos/sin/princarg) is excluded, so GFLOP/s
    # here is the MXU-visible rate. The conv rows above (same window)
    # are the practical peak reference: the chip is co-tenanted, so
    # only the within-run ratio is meaningful.
    from pqmf_tpu.pipelines import (PQMFPitchShiftWrapper,
                                    PQMFPitchShiftWrapperTA)

    BLK = 8192
    blk = jnp.asarray(rng.standard_normal((1, 1, BLK)).astype(np.float32))
    f32 = 4

    # flagship step: geometry + FLOP model
    w = PQMFPitchShiftWrapper(args.atten, M, BLK, SR)
    Tb = BLK // M
    n_fft, hop, win = w.n_fft, w.hop, w.win
    F = n_fft // 2 + 1
    frames = Tb // hop + 1
    fo_max = max(max(1, int(np.floor(frames / r))) for r in w._rates_py)
    ls_max = (fo_max - 1) * hop + n_fft
    fl_ana = 2 * Tb * M * (-(-Ka // M) * M)
    fl_stft = 2 * M * frames * n_fft * (2 * F)
    fl_sel = 2 * 2 * M * F * frames * fo_max * 2   # mag+phase x t0+t1
    fl_istft = 2 * M * fo_max * (2 * F) * n_fft
    fl_interp = 2 * M * Tb * ls_max                # one-hot resample
    fl_syn = 2 * Tb * M * (Ks * M)
    fl_step = fl_ana + fl_stft + fl_sel + fl_istft + fl_interp + fl_syn
    by_step = 2 * BLK * f32 + 2 * M * w.band_overlap * f32

    state = w.init_state()

    def flag_step(v):
        _, y = w.pitchshift_fn(state, v.reshape(1, 1, BLK))
        return y.reshape(1, 1, BLK)

    # TA step: FLOPs from the cached static plan
    # (rates, fo, ls, zero, W[M, Tb, Kt], starts, FO_max, pad_left, Lbuf)
    wt = PQMFPitchShiftWrapperTA(args.atten, M, BLK, SR)
    plan = wt._ta_plan(Tb)
    Kt = int(plan[4].shape[-1])      # banded resample taps per output
    fo_max_ta = int(plan[6])
    n_fft_t, hop_t = wt._n_fft, wt._hop
    F_t = n_fft_t // 2 + 1
    frames_t = Tb // hop_t + 1

    def ta_step(v):
        return wt.pitchshifter(v.reshape(1, 1, BLK)).reshape(1, 1, BLK)

    # 16-stream flagship step: same FLOP model x16. If GFLOP/s scales
    # toward the conv peak the single-stream residual is small-N MXU
    # underutilization (frames/fo columns ~5-66 vs the 256 the MXU
    # wants), recovered by stream batching — not a fixable kernel gap.
    NS = 16
    blk16 = jnp.asarray(
        rng.standard_normal((NS, BLK)).astype(np.float32))
    states16 = w.init_streams(NS)

    def flag_step16(v):
        _, y = w.pitchshift_streams(states16, v.reshape(NS, BLK))
        return y.reshape(NS, BLK)

    blk16ta = jnp.asarray(
        rng.standard_normal((NS, 1, BLK)).astype(np.float32))

    def ta_step16(v):
        return wt.pitchshifter(v.reshape(NS, 1, BLK)).reshape(NS, 1, BLK)

    fl_ta = (fl_ana + fl_syn
             # conv legs + STFT/ISTFT bases at the TA geometry + the
             # banded resample (width from the plan's weight matrix)
             + 2 * M * frames_t * n_fft_t * (2 * F_t)
             + 2 * M * fo_max_ta * (2 * F_t) * n_fft_t
             + 2 * M * Tb * Kt)

    for name, fn, inp, streams, nbytes, flops in [
            ("flagship pitchshift step (8192)", flag_step, blk, 1,
             by_step, fl_step),
            ("flagship step x16 streams", flag_step16, blk16, NS,
             NS * by_step, NS * fl_step),
            ("TA pitchshift step (8192)", ta_step, blk, 1, 2 * BLK * f32,
             fl_ta),
            ("TA step x16 batched", ta_step16, blk16ta, NS,
             NS * 2 * BLK * f32, NS * fl_ta)]:
        ms = chained_ms(fn, inp, n=max(args.chain, 200))
        gbs = nbytes / (ms * 1e-3) / 1e9
        gfs = flops / (ms * 1e-3) / 1e9
        rt_blocks = 60.0 * SR / BLK
        # ms/60s-audio is per 60 s of AGGREGATE audio (÷ streams)
        print(f"{name:34s} {ms:8.3f} {gbs:8.1f} {gfs:9.1f} "
              f"{ms * rt_blocks / streams:12.3f}")
    # --- whole-file offline step (VERDICT r4 item 4): the path bench.py
    # records as wholefile_pitchshift (~29.7 s per call, Tb far past the
    # one-hot crossover). FLOPs model the r5 chunked lowering (scan of
    # [B, span] @ [span, chunk] one-hot matmuls); the pre-r5 gather form
    # has ~zero MXU FLOPs at the same bytes — its row exists to show the
    # within-window cost delta (gather/chunked A/B: tools/ab_wholefile.py)
    from pqmf_tpu.pipelines import _resample_chunk

    TW = 16 * 81920
    TbW = TW // M
    framesW = TbW // hop + 1
    foW = [max(1, int(np.floor(framesW / r))) for r in w._rates_py]
    FOW = max(foW)
    lsW = (FOW - 1) * hop + n_fft
    chunkW = _resample_chunk(TbW)
    spanW = min(lsW, -(-chunkW * lsW // TbW) + 3)
    fl_sel_W = 2 * 2 * M * F * framesW * FOW * 2
    fl_W = (2 * TbW * M * (-(-Ka // M) * M)           # analysis conv
            + 2 * M * framesW * n_fft * (2 * F)       # band STFT
            + fl_sel_W                                # one-hot frame select
            + 2 * M * FOW * (2 * F) * n_fft           # ISTFT
            + 2 * M * TbW * spanW                     # chunked resample
            + 2 * TbW * M * (Ks * M))                 # synthesis conv
    xW = jnp.asarray(rng.standard_normal((1, 1, TW)).astype(np.float32))
    wW = PQMFPitchShiftWrapper(args.atten, M, BLK, SR,
                               max_buffer_size=None)
    stateW = wW.init_state()  # the whole-file wrapper's own geometry

    def wf_step(v):
        _, y = wW.pitchshift_fn(stateW, v.reshape(1, 1, TW))
        return y.reshape(1, 1, TW)

    ms = chained_ms(wf_step, xW, n=4)
    gbs = 2 * TW * f32 / (ms * 1e-3) / 1e9
    gfs = fl_W / (ms * 1e-3) / 1e9
    per60 = ms * 60.0 / (TW / SR)
    print(f"{'wholefile pitchshift (chunked)':34s} {ms:8.3f} {gbs:8.1f} "
          f"{gfs:9.1f} {per60:12.3f}")

    peak = max(conv_gfs)
    print(f"(conv-row peak this window: {peak:.0f} GFLOP/s — compare the "
          f"step rows' GFLOP/s against it for the within-window residual)")


if __name__ == "__main__":
    main()
