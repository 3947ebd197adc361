"""L3b — end-to-end processing pipelines + conTorchionist-style registry.

TPU-native rebuild of the reference's three wrappers:

- :class:`PQMFWrapper`            <- PQMFWrapper.py:17-92
- :class:`PQMFPitchShiftWrapper`  <- PitchShifterPvoc/1-PitchShifterWrapper.py:104-323
  (the flagship: per-band phase-vocoder shift with cross-block crossfade)
- :class:`PQMFPitchShiftWrapperTA`<- PitchShifterTorchaudio/PQMFPsWrapper.py:31-150

TPU-first architecture (SURVEY.md §3.4 "in the TPU build both loops
vanish"): the flagship's 16-band Python loop and the per-frame phase-
vocoder loop are replaced by ONE jitted XLA program —

    analysis conv -> batched matmul-DFT STFT of all bands -> vmapped
    stretch over bands (per-band rate/frames_out as arrays, padded to the
    max frame count with masks) -> masked OLA ISTFT -> per-band dynamic
    linear resample -> crossfade against carried state -> synthesis conv

with the crossfade state (`prev_tail`, reference :164-180) threaded
explicitly: ``pitchshift(state, x) -> (state', y)``. A convenience
stateful facade mirrors the reference's implicit-buffer call style for
real-time hosts.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from pqmf_tpu.ops import phase_vocoder as pv
from pqmf_tpu.ops import resample as rs
from pqmf_tpu.ops import stft as S
from pqmf_tpu.shifters import TorchaudioPitchShift
from pqmf_tpu.streaming import (
    _EMPTY,
    StreamingPQMF,
    _cached_analysis,
    _cached_synthesis,
)

__all__ = [
    "PQMFWrapper",
    "PQMFPitchShiftWrapper",
    "PQMFPitchShiftWrapperTA",
    "derive_stft_geometry",
    "stream_ola",
]


def _next_pow2(x: int) -> int:
    p = 1
    while p < x:
        p <<= 1
    return p


def _check_buffer(T: int, n_band: int, max_buffer_size, what: str = "input",
                  check_multiple: bool = True):
    """Input-length guard shared by the three wrappers: block length must
    divide into bands, and must respect the declared host-buffer limit
    (the reference declares ``max_buffer_size`` for Pure Data's buffer
    negotiation, PQMFWrapper.py:34-41, but never enforces it; here the
    declared limit is real). Offline whole-file processing — which the
    reference's own export mains do despite the declared limit — is
    opted into explicitly with ``max_buffer_size=None``.
    ``check_multiple=False`` for sub-band inputs, whose full-rate length
    T'*n_band is a multiple by construction."""
    if check_multiple and T % n_band:
        raise ValueError(
            f"{what} length {T} must be a multiple of n_band={n_band}")
    if max_buffer_size is not None and T > max_buffer_size:
        raise ValueError(
            f"{what} length {T} exceeds max_buffer_size={max_buffer_size} "
            f"(the declared host buffer limit); construct the wrapper "
            f"with max_buffer_size=None (or larger) for offline "
            f"whole-file processing")


def _check_declared_buffers(m_buffer_size: int, max_buffer_size) -> None:
    """A wrapper whose nominal block size exceeds its own declared host
    limit would reject every one of its own calls at runtime — catch the
    misconfiguration at construction instead."""
    if max_buffer_size is not None and m_buffer_size > max_buffer_size:
        raise ValueError(
            f"m_buffer_size={m_buffer_size} exceeds "
            f"max_buffer_size={max_buffer_size}; raise max_buffer_size (or "
            f"pass max_buffer_size=None for offline use)")


def derive_stft_geometry(m_buffer_size: int, n_band: int):
    """The reference's buffer-size-derived per-band STFT geometry
    (1-PitchShifterWrapper.py:137-151): returns (win, hop, n_fft,
    band_overlap). Defaults (8192, 16) -> (512, 128, 512, 128)."""
    sub_len_est = max(16, int(m_buffer_size // max(1, n_band)))
    win = int(max(16, min(sub_len_est, 4096)))
    hop = max(1, win // 4)
    n_fft = min(_next_pow2(win), 4096)
    if n_fft < win:
        n_fft = win
    band_overlap = int(min(hop, max(0, win // 4)))
    return win, hop, n_fft, band_overlap


# past this sub-band length the stretch/resample one-hot weight matrices
# (O(Tb * stretch_len) per band) no longer pay: whole-file offline calls
# switch to the linear-memory gather forms. ONE crossover for both
# pipelines — retuning it must move the flagship and the TA variant
# together (r3 review: two independent copies could silently diverge)
_ONEHOT_MAX_TB_DEFAULT = 2048

# resample_override="onehot" feasibility bar: the in-graph one-hot build
# materializes an O(Tb * stretch_len) f32 weight matrix per band; past
# ~1 GB of transient the trace dies in an opaque XLA allocation failure
# (a whole-file Tb=81920 would be ~64 GB), so the override path fails
# loudly at kind-selection time instead — same fail-loudly contract as
# its dense/chunked guards. The AUTO path never gets here (the
# _ONEHOT_MAX_TB crossover sits orders of magnitude lower).
_ONEHOT_OVERRIDE_MAX_BYTES = 1 << 30

# resident-bytes cap for the prefolded dense resample constants (r4):
# both pipelines' stretch resamples have STATIC numpy plans, so the
# whole resample prefolds into one constant matmul per band
# (resample_kind="dense") — the fastest serving form. Plans are cached
# per Tb, so each distinct serving length keeps its matrix on device;
# the default serving geometry (buffer 8192 -> Tb=512) is ~55 MB, a
# 16384 buffer would be ~144-176 MB and falls back to the in-graph
# one-hot build.
_DENSE_A_MAX_BYTES = 64 << 20


def _resample_chunk(Tb: int) -> int:
    """Static output-chunk size for the whole-file "chunked" stretch
    resample: the largest power-of-two divisor of Tb, capped at 2048
    (the default serving Tb — keeps each scanned one-hot matmul
    MXU-sized). Returns 0 when Tb has no divisor >= 128, in which case
    the caller falls back to the linear-memory gather."""
    c = Tb & -Tb  # largest power-of-two divisor
    c = min(c, 2048)
    return c if c >= 128 else 0


def _dense_device_cached(cache: dict, Tb: int, A):
    """Per-Tb device copy of a prefolded dense plan constant (shared by
    the flagship and TA wrappers — both keep a ``self._dense_dev`` dict).
    The plans cache numpy (trace-safety, see _plan), but an EAGER batched
    step passes the constant as a traced jit argument — without this
    cache every call re-uploads the ~52-56 MB constant host-to-device
    through the ~25 ms tunnel (advisor r4). device_put under an ACTIVE
    trace returns a DynamicJaxprTracer, which a cache would leak
    (UnexpectedTracerError on reuse — same hazard class as the _plan
    numpy rule); ensure_compile_time_eval forces a concrete committed
    array in every context, so the cached value is always safe and under
    an outer jit/scan it bakes in as a compile-time constant exactly like
    the numpy form."""
    dev = cache.get(Tb)
    if dev is None:
        with jax.ensure_compile_time_eval():
            dev = jax.device_put(np.asarray(A))
        cache[Tb] = dev
    return dev


# ---------------------------------------------------------------------------
# fused per-band phase-vocoder shift (the hot path)
# ---------------------------------------------------------------------------

# trace-time pin for tools/ab_trig.py ONLY: "stub" replaces the VPU
# transcendentals in the flagship stretch (the atan2 over every input
# bin, the cos/sin over every stretched bin) with same-shape cheap
# elementwise ops, bounding the attainable win from any trig
# optimization (VERDICT r4 item 3; DESIGN §5c attributes the step's
# 1.45x-of-conv-bound residual to this trig). Audio under the stub is
# garbage — never expose it as a user mode. A/B tools must
# jax.clear_caches() per arm (the jit trace cache ignores this global).
_TRIG = "real"


@partial(jax.jit, static_argnames=("n_fft", "hop", "win", "Tb", "FO_max",
                                   "crossfade", "phase_rule", "precision",
                                   "resample_kind"))
def _fused_band_pitchshift(bands, rates, frames_out, prev_tail, fade_out,
                           fade_in, n_fft, hop, win, Tb, FO_max,
                           crossfade=True, phase_rule="reference",
                           precision="highest", resample_kind="onehot",
                           interp_A=None):
    """Pitch-shift every sub-band in one fused program.

    bands: [B, M, Tb]; rates/frames_out: [M].
    crossfade True (reference semantics, batch==1 guard at
    1-PitchShifterWrapper.py:262): prev_tail [M, L].
    crossfade "batched" (multi-stream serving): prev_tail [M, B, L] —
    every batch row keeps its own carried tail.
    resample_kind:
    - "dense": the stretch-back resample is ONE matmul per band against
      the prefolded plan constant ``interp_A`` [M, total, Tb]
      (PQMFPitchShiftWrapper._fold_interp) — the fastest serving form;
    - "onehot": gather-free in-graph build (O(Tb * stretch_len) weight
      matrix per band);
    - "chunked": whole-file offline inputs — lax.scan of per-chunk
      one-hot matmuls over bounded source spans (O(chunk * span) live
      memory; see ops.resample.interpolate_linear_dynamic_chunked);
    - "gather": linear memory — the pre-r5 whole-file fallback (two
      minor-dim takes, the documented ~100x-slow pattern on this TPU),
      kept for Tb with no usable chunk divisor and as the A/B baseline.
    Returns (shifted [B, M, Tb], new_tail like prev_tail).
    """
    B, M, _ = bands.shape
    window = S.hann_window(win, bands.dtype)

    # --- batched STFT of all bands (same geometry) ---
    # band-major [M*B, Tb] (not [B*M]): under a (data, band) mesh the band
    # axis is sharded, and GSPMD can only shard a merged dimension when
    # the sharded factor is the MAJOR one — the [B*M] order forced an
    # all-gather of all bands before the STFT middle (seen in compiled
    # HLO), throwing the band parallelism away between the two shard_map
    # convs. Same math, element-identical results.
    x = jnp.swapaxes(bands, 0, 1).reshape(M * B, Tb)
    if Tb < n_fft:  # reference pads short sub-bands right to n_fft
        x = jnp.pad(x, ((0, 0), (0, n_fft - Tb)))
    re, im = S.stft_ri(x, n_fft, hop, window, center=True, normalized=True,
                       pad_mode="constant", precision=precision)
    F_, frames = re.shape[1], re.shape[2]
    re = re.reshape(M, B, F_, frames)  # [M, B, F, frames]
    im = im.reshape(M, B, F_, frames)

    # reference-rule omega MUST be the f32-stepwise construction: the
    # stretch's clamped boundary frames evaluate princarg(-omega) exactly
    # at the ±pi wrap, where the f64-then-cast values' 1-ulp differences
    # flip branches systematically (see phase_advance_reference docstring)
    omega = pv.phase_advance_reference(F_, hop, n_fft, bands.dtype)
    trim = n_fft // 2
    one_off = (n_fft - win) // 2  # placement of the 1-frame irfft fallback
    Ci, Si = S.idft_basis(n_fft, bands.dtype)
    hp = S.einsum_precision(precision)

    def one_band(re_b, im_b, rate, fo):
        """re_b/im_b: [B, F, frames]; rate: f32; fo: i32 (frames_out)."""
        # reference magphase + stretch rule, padded to FO_max and masked
        mag = jnp.sqrt(re_b * re_b + im_b * im_b + 1e-12)
        if _TRIG == "stub":  # measurement-only, see module global
            phase = im_b * 0.73 + re_b * 0.21
        else:
            phase = jnp.arctan2(im_b, re_b)

        j = jnp.arange(FO_max, dtype=bands.dtype)
        t_prime = j * rate
        t0 = jnp.clip(jnp.floor(t_prime).astype(jnp.int32), 0, frames - 1)
        t1 = jnp.minimum(t0 + 1, frames - 1)
        a = (t_prime - t0.astype(bands.dtype))[None, None, :]

        # frame selection via the shared one-hot matmul (bit-identical to
        # the gathers, and the documented fast form for this TPU's
        # minor-dim indexing — see pv._select_frames)
        mag0, phi0 = pv._select_frames(mag, phase, t0)
        mag1, phi1 = pv._select_frames(mag, phase, t1)
        mag_s = (1 - a) * mag0 + a * mag1
        om = omega[None, :, None]
        dp = pv.principal_angle(phi1 - phi0 - om)
        if phase_rule == "accumulate":
            # librosa/torchaudio running phase (opt-in fix of reference
            # quirk SURVEY §2.5-4): accumulate wrapped per-step advances
            incs = jnp.concatenate([phi0[..., :1], (dp + om)[..., :-1]],
                                   axis=-1)
            phi = jnp.cumsum(incs, axis=-1)
        else:  # the reference's per-frame-independent rule
            phi = phi0 + om + a * dp
        fmask = (jnp.arange(FO_max) < fo).astype(bands.dtype)
        if _TRIG == "stub":  # measurement-only, see module global
            cph, sph = phi * 0.9, 1.0 - phi * 0.45
        else:
            cph, sph = jnp.cos(phi), jnp.sin(phi)
        re_s = mag_s * cph * fmask[None, None, :]
        im_s = mag_s * sph * fmask[None, None, :]

        # masked OLA ISTFT over the full (untrimmed) buffer
        y, wsq = S.istft_ri_parts(re_s, im_s, n_fft, hop, window,
                                  normalized=True, frame_mask=fmask,
                                  precision=precision)
        ola = y / jnp.where(wsq > 1e-11, wsq, 1.0)  # [B, total]
        total = ola.shape[-1]
        i = jnp.arange(total)
        # center-fit of the istft output (length (fo-1)*hop) into
        # length_stretch = (fo-1)*hop + n_fft lands at the SAME buffer
        # positions [trim, trim + (fo-1)*hop) — a pure mask
        valid = (i >= trim) & (i < trim + (fo - 1) * hop)
        p_multi = ola * valid.astype(bands.dtype)

        # reference 1-frame fallback: direct (normalized-in, unscaled-out)
        # irfft of frame 0, cropped to win, centered in n_fft
        y1 = (jnp.einsum("bk,kn->bn", re_s[..., 0], Ci, precision=hp)
              + jnp.einsum("bk,kn->bn", im_s[..., 0], Si, precision=hp))
        p_one = jnp.zeros_like(ola).at[:, one_off:one_off + win].set(
            y1[:, :win])

        return jnp.where(fo == 1, p_one, p_multi)

    P = jax.vmap(one_band)(re, im, rates, frames_out)  # [M, B, total]

    # per-band resample back to Tb: gather-free one-hot lerp (see
    # interpolate_linear_dynamic), vmapped with each band's TRACED
    # stretch length — no per-band static specialization needed (the
    # earlier per-band strided-slice unrolling cost ~0.08 ms/block of
    # small-op overhead; this path measures below the timing floor)
    if resample_kind == "dense":
        # prefolded lerp weights (bit-identical to the in-graph one-hot
        # build — see _fold_interp); HIGHEST to match
        # interpolate_linear_dynamic's hard-coded matmul precision
        shifted = jnp.einsum("mbl,mlj->mbj", P, interp_A,
                             precision=jax.lax.Precision.HIGHEST)
    else:
        def interp(p_b, fo):
            length_stretch = jnp.maximum((fo - 1) * hop + n_fft, 1)
            if resample_kind == "gather":
                return rs.interpolate_linear_dynamic_gather(
                    p_b, length_stretch, Tb)
            if resample_kind == "chunked":
                return rs.interpolate_linear_dynamic_chunked(
                    p_b, length_stretch, Tb, chunk=_resample_chunk(Tb))
            return rs.interpolate_linear_dynamic(p_b, length_stretch, Tb)

        shifted = jax.vmap(interp)(P, frames_out)  # [M, B, Tb]

    # --- crossfade against the carried per-band tail ---
    L = prev_tail.shape[-1]
    # a block whose sub-band length cannot cover the crossfade overlap
    # would silently skip the blend and freeze the carried tail (audible
    # seams with no signal) — fail loudly instead, like the streaming
    # layer's block-parity guard. The reference guards this case too
    # (`shifted_band_i.size(-1) >= L`, 1-PitchShifterWrapper.py:262) and
    # silently SKIPS the blend; this build deliberately raises instead.
    wants_crossfade = (crossfade == "batched"
                       or (crossfade is True and B == 1))
    if wants_crossfade and L > 0 and Tb < L:
        raise ValueError(
            f"sub-band block length {Tb} is shorter than the crossfade "
            f"overlap {L}: blocks must be >= n_band*band_overlap = "
            f"{M * L} samples for this wrapper's geometry; construct the "
            f"wrapper with a matching m_buffer_size for smaller blocks")
    if crossfade == "batched" and L > 0 and Tb >= L:
        # per-batch tails [M, B, L]: every stream crossfades independently
        blended = prev_tail * fade_out + shifted[:, :, :L] * fade_in
        new_tail = shifted[:, :, Tb - L:]
        shifted = jnp.concatenate([blended, shifted[:, :, L:]], axis=-1)
    elif crossfade is True and L > 0 and B == 1 and Tb >= L:
        # reference semantics: single shared tail, batch==1 only (:262)
        head = shifted[:, 0, :L]
        blended = prev_tail * fade_out + head * fade_in
        new_tail = shifted[:, 0, Tb - L:]
        shifted = shifted.at[:, 0, :L].set(blended)
    else:
        new_tail = prev_tail
    return jnp.swapaxes(shifted, 0, 1), new_tail  # [B, M, Tb]


# ---------------------------------------------------------------------------
# wrappers
# ---------------------------------------------------------------------------


class _RegistryMixin:
    """conTorchionist protocol surface (PQMFWrapper.py:27-49): the host
    introspects exported modules via get_methods()/get_attributes() plus
    per-method channel counts and buffer-size attributes."""

    _methods: list
    _attributes: list

    def get_methods(self):
        return list(self._methods)

    def get_attributes(self):
        return list(self._attributes)

    def attribute_dict(self):
        return {name: getattr(self, name) for name in self._attributes}


class PQMFWrapper(_RegistryMixin):
    """Plain analysis/synthesis wrapper (reference PQMFWrapper.py:17-92).

    Methods: ``forward`` (mono -> n_band sub-bands), ``inverse``,
    ``process`` (-> (reconstructed, subbands), matching the reference's
    actual return order — its docstring says the opposite, SURVEY §2.5-5).
    """

    def __init__(self, attenuation: int = 100, n_band: int = 16,
                 m_buffer_size: int = 512, precision: str = "highest",
                 use_pallas="auto", mesh=None,
                 max_buffer_size: int | None = 16384):
        self.n_band = n_band
        self.attenuation = attenuation
        self.pqmf = StreamingPQMF(attenuation, n_band, precision=precision,
                                  use_pallas=use_pallas, mesh=mesh)
        self._methods = ["forward", "inverse", "process"]
        self._attributes = [
            "n_band", "attenuation",
            "forward_in_ch", "forward_out_ch",
            "inverse_in_ch", "inverse_out_ch",
            "process_in_ch", "process_out_ch",
            "m_buffer_size", "max_buffer_size",
        ]
        # exact reference values (PQMFWrapper.py:34-41)
        self.forward_in_ch = 1
        self.forward_out_ch = 1
        self.inverse_in_ch = 1
        self.inverse_out_ch = 1
        self.process_in_ch = 1
        self.process_out_ch = 2
        self.m_buffer_size = m_buffer_size
        self.max_buffer_size = max_buffer_size
        _check_declared_buffers(m_buffer_size, max_buffer_size)

    def forward(self, x):
        x = jnp.asarray(x)
        if x.ndim == 2:
            x = x[None]
        if not (x.ndim == 3 and x.shape[1] == 1):
            raise ValueError(
                "input must be [1, buffer_size] or [batch, 1, buffer_size]")
        _check_buffer(x.shape[-1], self.n_band, self.max_buffer_size)
        return self.pqmf.forward(x)

    def inverse(self, x):
        x = jnp.asarray(x)
        if not (x.ndim == 3 and x.shape[1] == self.n_band):
            raise ValueError(
                f"input must be [batch, {self.n_band}, T'] or "
                f"[1, {self.n_band}, T']")
        _check_buffer(x.shape[-1] * self.n_band, self.n_band,
                      self.max_buffer_size, what="sub-band signal",
                      check_multiple=False)
        return self.pqmf.inverse(x)

    def process(self, x):
        subbands = self.forward(x)
        reconstructed = self.inverse(subbands)
        return reconstructed, subbands

    __call__ = forward


class PQMFPitchShiftWrapper(_RegistryMixin):
    """Flagship: per-band phase-vocoder pitch shift with cross-block
    crossfade (reference 1-PitchShifterWrapper.py:104-323).

    Pure API: ``init_state()`` then ``pitchshift_fn(state, x) ->
    (state', y)`` — one fused jitted program. Stateful facade:
    ``pitchshift(x)`` carries state internally like the reference module.
    """

    def __init__(self, attenuation: int = 100, n_band: int = 16,
                 m_buffer_size: int = 8192, sample_rate: int = 44100,
                 shifts_in_semitones=None, precision: str = "highest",
                 use_pallas="auto", phase_rule: str = "reference",
                 mesh=None, max_buffer_size: int | None = 16384):
        self.n_band = n_band
        self.attenuation = attenuation
        self.sample_rate = sample_rate
        self.precision = precision
        self.pqmf = StreamingPQMF(attenuation, n_band, precision=precision,
                                  use_pallas=use_pallas, mesh=mesh)

        self._methods = ["forward", "pitchshift"]
        self._attributes = [
            "n_band", "attenuation",
            "forward_in_ch", "forward_out_ch",
            "pitchshift_in_ch", "pitchshift_out_ch",
            "m_buffer_size", "max_buffer_size",
        ]
        self.forward_in_ch = 1
        self.forward_out_ch = 1
        self.pitchshift_in_ch = 1
        self.pitchshift_out_ch = 1
        self.m_buffer_size = m_buffer_size
        self.max_buffer_size = max_buffer_size
        _check_declared_buffers(m_buffer_size, max_buffer_size)

        if shifts_in_semitones is None:
            self.shifts = list(range(n_band))  # chromatic default (:131)
        else:
            self.shifts = list(shifts_in_semitones)
        if len(self.shifts) != n_band:
            # a real ValueError, not an assert: `python -O` strips asserts
            # and a silently mis-sized shift list corrupts the per-band
            # mapping downstream
            raise ValueError(
                f"expected {n_band} shifts, got {len(self.shifts)}")

        self.win, self.hop, self.n_fft, self.band_overlap = (
            derive_stft_geometry(m_buffer_size, n_band))

        # per-band rates from static integer semitone shifts (:159-161)
        n_steps = [int(round(float(s))) for s in self.shifts]
        rates = [1.0 / (2.0 ** (s / 12.0)) for s in n_steps]
        self._rates = jnp.asarray(rates, jnp.float32)
        self._rates_py = rates
        self.Tb = m_buffer_size // n_band
        self._plans = {}
        self._dense_dev = {}
        if phase_rule not in ("reference", "accumulate"):
            raise ValueError(f"unknown phase_rule {phase_rule!r}: expected "
                             "'reference' or 'accumulate'")
        self.phase_rule = phase_rule

        L = self.band_overlap
        if L > 0:
            full = np.asarray(S.hann_window(2 * L))
            self._fade_out = jnp.asarray(full[:L])
            self._fade_in = jnp.asarray(full[L:])
        else:
            self._fade_out = jnp.zeros((0,), jnp.float32)
            self._fade_in = jnp.zeros((0,), jnp.float32)
        self._state = self.init_state()

    # -- pure functional API -------------------------------------------------

    def init_state(self):
        """Crossfade state pytree: per-band previous tail
        (reference buffers :172-180)."""
        return {"prev_tail": jnp.zeros((self.n_band, self.band_overlap),
                                       jnp.float32)}

    def decompose(self, x):
        x = jnp.asarray(x)
        if x.ndim == 2:
            x = x[None]
        if not (x.ndim == 3 and x.shape[1] == 1):
            raise ValueError(
                "input must be [1, buffer_size] or [batch, 1, buffer_size]")
        _check_buffer(x.shape[-1], self.n_band, self.max_buffer_size)
        return self.pqmf.forward(x)

    def inverse(self, x):
        x = jnp.asarray(x)
        if not (x.ndim == 3 and x.shape[1] == self.n_band):
            raise ValueError(
                f"input must be [batch, {self.n_band}, T']")
        _check_buffer(x.shape[-1] * self.n_band, self.n_band,
                      self.max_buffer_size, what="sub-band signal",
                      check_multiple=False)
        return self.pqmf.inverse(x)

    def _plan(self, Tb: int):
        """Static stretch plan for a given band length: the reference
        derives frame counts from each call's actual input length
        (PhaseVocoderPitchShift pads short inputs to n_fft), so blocks
        shorter than m_buffer_size (e.g. the 4096-sample windows of the
        block harness) get their own specialization."""
        plan = self._plans.get(Tb)
        if plan is None:
            Tp = max(Tb, self.n_fft)
            frames = S.frame_count(Tp, self.n_fft, self.hop)
            fo = [max(1, int(math.floor(frames / r)))
                  for r in self._rates_py]
            # numpy (not jnp): this cache outlives any trace context, and a
            # jnp constant created during jax.export tracing would be a
            # leaked tracer (UnexpectedTracerError on reuse).
            A = self._fold_interp(Tb, fo)
            plan = (np.asarray(fo, np.int32), max(fo), A)
            self._plans[Tb] = plan
        return plan

    def _fold_interp(self, Tb: int, fo: list):
        """Prefold the per-band stretch-back resample
        (ops.resample.interpolate_linear_dynamic with each band's STATIC
        stretch length) into one constant A [M, total, Tb] so the serving
        step's resample is ONE matmul per band (resample_kind="dense";
        r4: the in-graph one-hot lerp build was 23% of the 16-stream
        step, device trace). The numpy f32 scalar arithmetic below
        replicates the traced index/weight math bit-exactly (verify
        ledger: np.float32 reproduces XLA/torch f32 scalar rounding),
        including the documented 1-ulp (1-a)+a clamp-case behavior via
        the += accumulation. Returns None past the resident-byte gate."""
        total = self.n_fft + (max(fo) - 1) * self.hop
        if self.n_band * total * Tb * 4 > _DENSE_A_MAX_BYTES:
            return None
        A = np.zeros((self.n_band, total, Tb), np.float32)
        j = np.arange(Tb)
        for m, fo_m in enumerate(fo):
            L = max((fo_m - 1) * self.hop + self.n_fft, 1)
            src = ((np.arange(Tb, dtype=np.float32) + np.float32(0.5))
                   * (np.float32(L) / np.float32(Tb)) - np.float32(0.5))
            src = np.clip(src, np.float32(0.0),
                          np.float32(max(L - 1, 0)))
            i0 = np.floor(src).astype(np.int32)
            i1 = np.minimum(i0 + 1, max(L - 1, 0))
            i0 = np.clip(i0, 0, total - 1)
            i1 = np.clip(i1, 0, total - 1)
            a = (src - i0.astype(np.float32)).astype(np.float32)
            A[m, i0, j] += np.float32(1.0) - a
            A[m, i1, j] += a
        return A

    # the shared one-hot/gather crossover (module docstring at the
    # constant; same trade as PQMFPitchShiftWrapperTA)
    _ONEHOT_MAX_TB = _ONEHOT_MAX_TB_DEFAULT

    # the prefolded dense resample only pays once its ~55 MB constant
    # read amortizes across streams: same-window A/B at the default
    # geometry measured dense/onehot = 2.69x at B=1 (0.140 vs 0.052 ms
    # - the lean single-stream step is dominated by reading A) but
    # 0.92x at B=16; crossover modeled at ~8 streams
    _DENSE_MIN_B = 8

    # measurement/expert knob: pin the stretch-resample lowering
    # ("dense"/"onehot"/"chunked"/"gather") regardless of the crossover
    # logic below. Every lowering is bit-compatible (tested), so this
    # only moves time, never audio. Used by tools/ab_wholefile.py.
    resample_override: str | None = None

    def _resample_kind(self, Tb: int, A, B: int,
                       total: int | None = None) -> str:
        """Pick the stretch-resample lowering: the prefolded dense matmul
        when the plan built it AND the batch amortizes its constant read
        (see _DENSE_MIN_B; r4 device trace: the in-graph one-hot build
        was 23% of the 16-stream step), else the in-graph one-hot below
        the memory crossover, else the chunked scan-of-one-hot-matmuls
        form for whole-file lengths (r5 same-window A/B at Tb=81920:
        gather/chunked = 2.15x, 28.8 -> 13.4 ms per 29.7 s call, parity
        337 dB — tools/ab_wholefile.py), with the gather kept for Tb
        with no usable chunk divisor. ``total`` (the stretch buffer
        length, when the caller knows it) feeds the override='onehot'
        feasibility check."""
        if self.resample_override is not None:
            kind = self.resample_override
            if kind not in ("dense", "onehot", "chunked", "gather"):
                raise ValueError(f"unknown resample_override {kind!r}")
            # the knob's contract is "moves time, never audio" — fail
            # loudly when the pinned lowering cannot exist at this
            # geometry instead of crashing inside the trace
            if kind == "dense" and A is None:
                raise ValueError(
                    f"resample_override='dense': the Tb={Tb} plan built no "
                    f"dense constant (byte gate {_DENSE_A_MAX_BYTES>>20} MB)")
            if kind == "chunked" and not _resample_chunk(Tb):
                raise ValueError(
                    f"resample_override='chunked': Tb={Tb} has no "
                    "power-of-two divisor >= 128 to chunk by")
            if (kind == "onehot" and total is not None
                    and Tb * total * 4 > _ONEHOT_OVERRIDE_MAX_BYTES):
                raise ValueError(
                    f"resample_override='onehot': the per-band weight "
                    f"matrix would be {Tb * total * 4 >> 20} MB at Tb={Tb} "
                    f"(cap {_ONEHOT_OVERRIDE_MAX_BYTES >> 20} MB) — use "
                    "'chunked' or 'gather' at whole-file lengths")
            return kind
        if A is not None and B >= self._DENSE_MIN_B:
            return "dense"
        if Tb <= self._ONEHOT_MAX_TB:
            return "onehot"
        return "chunked" if _resample_chunk(Tb) else "gather"

    def _dense_device(self, Tb: int, A):
        return _dense_device_cached(self._dense_dev, Tb, A)

    def pitchshift_fn(self, state, x):
        """(state, x [1,T] | [B,1,T]) -> (state', y [B, T])."""
        sub = self.decompose(x)  # [B, M, Tb]
        B, _, Tb = sub.shape
        frames_out, FO_max, A = self._plan(Tb)
        kind = self._resample_kind(
            Tb, A, B, total=self.n_fft + (FO_max - 1) * self.hop)
        A = self._dense_device(Tb, A) if kind == "dense" else None
        shifted, new_tail = _fused_band_pitchshift(
            sub, self._rates, frames_out, state["prev_tail"],
            self._fade_out, self._fade_in, self.n_fft, self.hop, self.win,
            Tb, FO_max, crossfade=(B == 1), phase_rule=self.phase_rule,
            precision=self.precision, resample_kind=kind, interp_A=A)
        y = self.inverse(shifted)  # [B, 1, T]
        return {"prev_tail": new_tail}, y[:, 0, :]

    def forward_fn(self, x):
        """Pure round-trip (reference ``forward``, :303-316) -> [B, T].

        Routed through ``StreamingPQMF.roundtrip`` — the grouped-layout
        fused program when supported (equal to ``inverse(decompose(x))``
        to f32 rounding on chip — the default slice scheme's transposed
        dots round differently at ~2e-7; bit-exact on CPU — and ~1.5x
        faster on chip)."""
        x = jnp.asarray(x)
        if x.ndim == 2:
            x = x[None]
        if not (x.ndim == 3 and x.shape[1] == 1):
            raise ValueError(
                "input must be [1, buffer_size] or [batch, 1, buffer_size]")
        _check_buffer(x.shape[-1], self.n_band, self.max_buffer_size)
        return self.pqmf.roundtrip(x)[:, 0, :]

    # -- multi-stream serving -------------------------------------------------

    def init_streams(self, n_streams: int):
        """Per-stream crossfade state [S, M, L] for ``n_streams``
        independent real-time streams."""
        return {"prev_tail": jnp.zeros(
            (n_streams, self.n_band, self.band_overlap), jnp.float32)}

    def pitchshift_streams(self, states, x):
        """Stateful step over S independent streams in ONE fused program —
        each stream keeps its own crossfade tail (the reference's
        module-buffer design is single-stream only, batch==1 guarded at
        :262; explicit per-stream state removes the limit, and the streams
        ride the batch axis of the same kernels).
        x: [n_streams, T] -> (states', y [n_streams, T])."""
        sub = self.decompose(x[:, None, :])  # [n_streams, M, Tb]
        Tb = sub.shape[-1]
        frames_out, FO_max, A = self._plan(Tb)
        tails = jnp.swapaxes(states["prev_tail"], 0, 1)  # [M, S, L]
        kind = self._resample_kind(
            Tb, A, sub.shape[0], total=self.n_fft + (FO_max - 1) * self.hop)
        A = self._dense_device(Tb, A) if kind == "dense" else None
        shifted, new_tails = _fused_band_pitchshift(
            sub, self._rates, frames_out, tails,
            self._fade_out, self._fade_in, self.n_fft, self.hop, self.win,
            Tb, FO_max, crossfade="batched", phase_rule=self.phase_rule,
            precision=self.precision, resample_kind=kind, interp_A=A)
        y = self.inverse(shifted)
        return ({"prev_tail": jnp.swapaxes(new_tails, 0, 1)}, y[:, 0, :])

    # -- stateful facade (reference-style implicit buffers) ------------------

    def reset(self):
        self._state = self.init_state()

    def pitchshift(self, x):
        self._state, y = self.pitchshift_fn(self._state, x)
        return y

    processing = pitchshift

    def forward(self, x):
        return self.forward_fn(x)

    __call__ = forward


# stream_ola's compiled programs are cached ON the wrapper instance
# (wrapper._stream_ola_fns), keyed by the static harness geometry. The
# step closures below are rebuilt per program; a bare @jax.jit on the
# harness body would MISS jit's trace cache on every call (fresh closure
# identity) and re-trace + multi-dispatch through the ~25 ms tunnel each
# time — exactly the r4 bench defect (VERDICT weak #1). Keeping the
# cache on the instance (not a module global) means a dropped wrapper
# releases its compiled programs: the wrapper -> dict -> run -> step ->
# wrapper cycle is ordinary gc-collectable garbage. (A module-level
# WeakKeyDictionary does NOT work here — its values reference the key
# through the step closure, so the weakref could never fire.)


def _stream_ola_program(wrapper, block: int, hop: int, n_frames: int,
                        C: int, T: int):
    """Build + jit the whole-file OLA harness for one static geometry:
    right-pad to the frame grid -> frame -> Hann window -> lax.scan of
    (stateful pitchshift, round trip) -> windowed overlap-add / Σwin² ->
    trim back to T. One XLA program, one dispatch — the pad and trim
    live INSIDE the jit (T is static per cached program), so a repeated
    call issues no eager device ops at all (r5 review: the pad + two
    slices outside were ~3 extra ~25 ms tunnel dispatches per call)."""

    if C == 1:
        state0 = wrapper.init_state()

        def step(state, blk):
            state, out = wrapper.pitchshift_fn(state, blk[:, None, :])
            rec = wrapper.forward_fn(blk[:, None, :])
            return state, (out, rec)
    else:
        state0 = wrapper.init_streams(C)

        def step(states, blk):
            states, out = wrapper.pitchshift_streams(states, blk)
            rec = wrapper.forward_fn(blk[:, None, :])
            return states, (out, rec)

    total = (n_frames - 1) * hop + block

    @jax.jit
    def run(x):
        xp = jnp.pad(x, ((0, 0), (0, total - T)))
        window = S.hann_window(block, xp.dtype)
        framed = S._frame_signal(xp, block, hop, n_frames)  # [C, N, block]
        blocks = jnp.swapaxes(framed * window, 0, 1)        # [N, C, block]
        _, (outs, recs) = jax.lax.scan(step, state0, blocks)
        wsq = jnp.broadcast_to(window * window, (n_frames, block))
        norm = S._ola(wsq, block, hop) + 1e-8  # harness's exact epsilon
        pitch = S._ola(jnp.swapaxes(outs * window, 0, 1), block, hop) / norm
        recon = S._ola(jnp.swapaxes(recs * window, 0, 1), block, hop) / norm
        return pitch[:, :T], recon[:, :T]

    return run


def stream_ola(wrapper, x, block: int, overlap: int | None = None):
    """The whole block-streaming harness (reference 2-TestBlocks.py:86-126)
    as ONE jitted XLA program: Hann-windowed overlapping blocks ->
    ``lax.scan`` of the stateful pitchshift step (carried crossfade state)
    and of the plain round trip -> windowed overlap-add normalized by the
    accumulated window energy. The compiled program (pad and trim
    included) is cached per (wrapper, block, hop, T, channels), so
    repeated calls are ONE dispatch each with zero re-tracing and zero
    eager device ops — the SURVEY §5 long-context north star. Returns
    device arrays (no host syncs inside).

    x: [C, T] (or [T]); returns (pitch_stream [C, T], recon_stream
    [C, T]). With C > 1 (e.g. a stereo fixture) each channel rides its
    own serving stream with an independent crossfade state — something
    the reference cannot do at all (its crossfade is single-stream,
    batch==1 guarded at 1-PitchShifterWrapper.py:262, and its harness
    drops to the first channel).
    """
    x = jnp.asarray(x)
    if x.ndim == 1:
        x = x[None]
    C, T = x.shape
    hop = block - (block // 2 if overlap is None else overlap)
    if hop <= 0 or hop > block:
        raise ValueError("overlap must be in [0, block-1]")
    n_frames = 1 if T <= block else -(-(T - block) // hop) + 1

    fns = wrapper.__dict__.setdefault("_stream_ola_fns", {})
    # weights_version: the compiled program bakes the filterbank weights
    # at trace time; a set_weights (artifact restore / fine-tuned bank)
    # must invalidate it rather than silently serve the old audio
    ver = getattr(wrapper.pqmf, "weights_version", 0)
    # keyed by T (not n_frames): the pad/trim live inside the program,
    # so the input length is part of the compiled shape. The pinned
    # resample lowering is part of the key too — it is a trace-time
    # decision baked into the program, and the knob exists FOR timing
    # A/Bs, so a stale program under a changed override would silently
    # time the wrong lowering (review r5)
    key = (block, hop, T, C, ver, wrapper.resample_override)
    run = fns.get(key)
    if run is None:
        # weights_version only advances, so programs traced under older
        # versions can never be hit again — evict them instead of
        # accumulating one dead program set per set_weights call
        for stale in [k for k in fns if k[4] != ver]:
            del fns[stale]
        run = _stream_ola_program(wrapper, block, hop, n_frames, C, T)
        fns[key] = run

    return run(x)


# ---------------------------------------------------------------------------
# fused torchaudio-variant per-band shift
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("n_fft", "hop", "win", "Tb", "FO_max",
                                   "pad_left", "Lbuf", "resample_kind",
                                   "precision"))
def _fused_ta_pitchshift(bands, rates, frames_out, len_stretch, zero_shift,
                         W, start, n_fft, hop, win, Tb, FO_max, pad_left,
                         Lbuf, resample_kind="onehot", precision="highest"):
    """All 16 torchaudio-style band shifts in ONE fused program
    (reference per-band loop: PQMFPsWrapper.py:126-144; torchaudio
    PitchShift = accumulate-phase stretch + sinc resample).

    bands: [B, M, Tb]. Per-band arrays: rates/frames_out/len_stretch/
    zero_shift [M]; W [M, Tb, K_taps] banded resample weights; start
    [M, Tb] window starts into the pad_left-offset stretch buffer of
    static length Lbuf (see ops.resample.banded_resample_plan).
    resample_kind:
    - "dense": W is instead the prefolded constant A [M, Lbuf, Tb]
      from _ta_plan (start is ignored) and the resample is ONE matmul
      per band — the fastest serving form, at the cost of an
      O(M*Lbuf*Tb) device-resident plan constant;
    - "onehot": in-graph one-hot select + tap contraction (O(Tb * Lbuf)
      transient per band);
    - "gather": O(Tb * K_taps) memory — the right choice for whole-file
      offline inputs where the others would not fit.
    Returns shifted [B, M, Tb].
    """
    B, M, _ = bands.shape
    dt = bands.dtype
    window = S.hann_window(win, dt)

    # batched reflect-pad STFT of all bands (one geometry, torchaudio's
    # normalized=False convention); band-major so a (data, band) mesh
    # keeps the band axis sharded through the middle (see the flagship
    # _fused_band_pitchshift for the GSPMD reshape rule)
    x = jnp.swapaxes(bands, 0, 1).reshape(M * B, Tb)
    re, im = S.stft_ri(x, n_fft, hop, window, center=True, normalized=False,
                       pad_mode="reflect", precision=precision)
    F_, frames = re.shape[1], re.shape[2]
    re = re.reshape(M, B, F_, frames)  # [M, B, F, frames]
    im = im.reshape(M, B, F_, frames)
    omega = pv.phase_advance(F_, hop, n_fft, dt)
    trim = n_fft // 2
    K_taps = W.shape[-1]
    hp = S.einsum_precision(precision)

    def one_band(re_b, im_b, rate, fo, ls, W_b, st_b):
        re_s, im_s = pv.stretch_accumulate(re_b, im_b, rate, omega, FO_max)
        fmask = (jnp.arange(FO_max) < fo).astype(dt)
        y, wsq = S.istft_ri_parts(re_s, im_s, n_fft, hop, window,
                                  normalized=False, frame_mask=fmask,
                                  precision=precision)
        out = y / jnp.where(wsq > 1e-11, wsq, 1.0)
        # torch.istft(length=ls) semantics: [trim, trim+ls), zeros beyond
        ystr = out[:, trim:]
        t = jnp.arange(ystr.shape[-1])
        ystr = ystr * (t < ls).astype(dt)
        ystr = jnp.pad(ystr,
                       ((0, 0), (pad_left, Lbuf - pad_left - ystr.shape[-1])))
        if resample_kind == "dense":
            # the banded weights and window starts are STATIC (numpy
            # plan), so the whole resample is one matmul against the
            # prefolded constant A_b [Lbuf, Tb] (A[start_j + k, j] =
            # W[j, k], built in _ta_plan) — no Yk slice stack, no
            # in-graph one-hot build, K_taps x fewer MXU FLOPs. Traced
            # here as W_b. r4: the stack+select+contract chain was 47%
            # of the 16-stream TA step (229 us select einsum + 156 us
            # Yk concatenate per 813 us step, device trace).
            return jnp.einsum("bl,lj->bj", ystr, W_b, precision=hp)
        if resample_kind == "gather":
            # O(Tb*K) memory; the gather is slow per-op on TPU (~2.4 ms
            # at Tb=512) but scales linearly — used for whole-file inputs
            idx = st_b[:, None] + jnp.arange(K_taps)[None, :]
            g = jnp.take(ystr, idx.reshape(-1), axis=-1,
                         mode="clip").reshape(B, Tb, K_taps)
            return jnp.einsum("btk,tk->bt", g, W_b, precision=hp)
        # gather-free banded resample (K_taps shifted slices + one-hot
        # select + tap reduce). A jnp.take gather here measured
        # 2.4 ms/block on TPU — ~100x the rest of the step. Contraction
        # order matters: selecting FIRST (E[k, j] = ystr[start_j + k] via
        # iota==start one-hot) keeps the intermediate at [B, K, Tb]
        # instead of the earlier C[j, p] = (W @ slices) form whose
        # [B, Tb, P] buffer was ~30x larger (16 MB/step across bands).
        P = Lbuf - K_taps + 1
        Yk = jnp.stack([ystr[:, k:k + P] for k in range(K_taps)], axis=1)
        sel = (jax.lax.broadcasted_iota(jnp.int32, (Tb, P), 1)
               == st_b[:, None]).astype(dt)
        E = jnp.einsum("bkp,jp->bkj", Yk, sel, precision=hp)
        return jnp.einsum("bkj,jk->bj", E, W_b, precision=hp)

    z = jax.vmap(one_band)(re, im, rates, frames_out, len_stretch, W, start)
    # n_steps == 0 bands pass through untouched (torchaudio early-out,
    # shifters.TorchaudioPitchShift.__call__)
    z = jnp.where(zero_shift[:, None, None] > 0,
                  jnp.swapaxes(bands, 0, 1), z)
    return jnp.swapaxes(z, 0, 1)  # [B, M, Tb]


class PQMFPitchShiftWrapperTA(_RegistryMixin):
    """torchaudio-variant wrapper (reference PQMFPsWrapper.py:31-150):
    per-band ``TorchaudioPitchShift`` at the sub-band sample rate
    ``round(sr / n_band)``, center crop / pad back, reconstruct.

    ``pitchshifter`` runs decompose -> all-band fused shift -> reconstruct
    as ONE jitted XLA program (the per-band resample ratios batch via the
    banded sinc plan); ``pitchshifter_loop`` keeps the literal per-band
    dispatch structure of the reference as a parity oracle."""

    def __init__(self, attenuation: int = 100, n_band: int = 16,
                 m_buffer_size: int = 512, sample_rate: int = 44100,
                 shifts_in_semitones=None, precision: str = "highest",
                 use_pallas="auto", mesh=None,
                 max_buffer_size: int | None = 8192):
        self.n_band = n_band
        self.attenuation = attenuation
        self.sample_rate = sample_rate
        self.precision = precision
        self.pqmf = StreamingPQMF(attenuation, n_band, precision=precision,
                                  use_pallas=use_pallas, mesh=mesh)

        self._methods = ["forward", "inverse", "pitchshifter"]
        self._attributes = [
            "n_band", "attenuation",
            "forward_in_ch", "forward_out_ch",
            "inverse_in_ch", "inverse_out_ch",
            "pitchshifter_in_ch", "pitchshifter_out_ch",
            "m_buffer_size", "max_buffer_size",
        ]
        self.forward_in_ch = 1
        self.forward_out_ch = 1
        self.inverse_in_ch = 1
        self.inverse_out_ch = 1
        self.pitchshifter_in_ch = 1
        self.pitchshifter_out_ch = 2
        self.m_buffer_size = m_buffer_size
        self.max_buffer_size = max_buffer_size
        _check_declared_buffers(m_buffer_size, max_buffer_size)

        sub_sr = int(round(float(sample_rate) / float(max(1, n_band))))
        self.sub_band_sample_rate = sub_sr
        if shifts_in_semitones is None:
            self.shifts = list(range(n_band))
        else:
            self.shifts = list(shifts_in_semitones)
        if len(self.shifts) != n_band:
            raise ValueError(
                f"expected {n_band} shifts, got {len(self.shifts)}")
        self.pitch_shifters = [
            TorchaudioPitchShift(sub_sr, int(round(float(s))))
            for s in self.shifts
        ]
        sh0 = self.pitch_shifters[0]
        self._n_fft, self._win, self._hop = (sh0.n_fft, sh0.win_length,
                                             sh0.hop_length)
        self._ta_plans = {}
        self._dense_dev = {}
        self._pitchshifter_jit = jax.jit(
            self._pitchshifter_impl,
            static_argnames=("FO_max", "pad_left", "Lbuf",
                             "resample_kind"))

    def forward(self, x):
        x = jnp.asarray(x)
        if x.ndim == 2:
            x = x[None]
        if not (x.ndim == 3 and x.shape[1] == 1):
            raise ValueError(
                "input must be [1, buffer_size] or [batch, 1, buffer_size]")
        _check_buffer(x.shape[-1], self.n_band, self.max_buffer_size)
        return self.pqmf.forward(x)

    def inverse(self, x):
        x = jnp.asarray(x)
        if not (x.ndim == 3 and x.shape[1] == self.n_band):
            raise ValueError(f"input must be [batch, {self.n_band}, T']")
        _check_buffer(x.shape[-1] * self.n_band, self.n_band,
                      self.max_buffer_size, what="sub-band signal",
                      check_multiple=False)
        return self.pqmf.inverse(x)

    # -- fused path (ONE jitted dispatch) ------------------------------------

    def _ta_plan(self, Tb: int):
        """Static per-band plan for band length Tb: stretch geometry +
        banded sinc-resample weights/indices padded to common shapes
        (host-side NumPy, cached per Tb like the flagship's _plans)."""
        plan = self._ta_plans.get(Tb)
        if plan is not None:
            return plan
        sub_sr = self.sub_band_sample_rate
        M = self.n_band
        frames = S.frame_count(Tb, self._n_fft, self._hop)
        rates, fo, ls, zero, banded = [], [], [], [], []
        for sh in self.pitch_shifters:
            if sh.n_steps == 0:  # identity early-out, torchaudio-style
                rates.append(1.0)
                fo.append(frames)
                ls.append(Tb)
                zero.append(1.0)
                banded.append((np.zeros((Tb, 1), np.float32),
                               np.zeros((Tb,), np.int32), 0))
                continue
            _, fo_b, ls_b, orig_b = sh.geometry(Tb)
            Wb, st, wd = rs.banded_resample_plan(orig_b, sub_sr, Tb)
            g = math.gcd(orig_b, sub_sr)
            # torchaudio target length ceil(T*new/orig); rows past it are
            # the right zero-pad of _ta_shift_core
            valid = int(math.ceil(ls_b * (sub_sr // g) / (orig_b // g)))
            Wb = Wb.copy()
            Wb[min(valid, Tb):] = 0.0
            rates.append(sh.rate)
            fo.append(fo_b)
            ls.append(ls_b)
            zero.append(0.0)
            banded.append((Wb, st, wd))
        FO_max = max(fo)
        Kt = max(w.shape[-1] for w, _, _ in banded)
        pad_left = max(wd for _, _, wd in banded)
        W = np.zeros((M, Tb, Kt), np.float32)
        starts = np.zeros((M, Tb), np.int32)
        for i, (Wb, st, _) in enumerate(banded):
            W[i, :, : Wb.shape[-1]] = Wb
            starts[i] = st + pad_left
        ystr_len = self._n_fft // 2 + (FO_max - 1) * self._hop
        Lbuf = max(pad_left + ystr_len, int(starts.max()) + Kt)
        # prefolded dense resample matrices A[m, starts[m, j] + k, j] =
        # W[m, j, k]: the whole banded resample becomes one matmul per
        # band against a plan CONSTANT (resample_kind="dense"). Within a
        # column j the K tap rows are distinct, so plain assignment
        # builds it exactly; gated on resident bytes because plans are
        # cached per Tb (the default serving geometry Tb=512 is ~52 MB:
        # 16 bands x Lbuf~1679 x 512 x 4 B).
        A = None
        if M * Lbuf * Tb * 4 <= _DENSE_A_MAX_BYTES:
            A = np.zeros((M, Lbuf, Tb), np.float32)
            j = np.arange(Tb)
            for m in range(M):
                for k in range(Kt):
                    A[m, starts[m] + k, j] = W[m, :, k]
        plan = (np.asarray(rates, np.float32), np.asarray(fo, np.int32),
                np.asarray(ls, np.int32), np.asarray(zero, np.float32),
                W, starts, FO_max, pad_left, Lbuf, A)
        self._ta_plans[Tb] = plan
        return plan

    # the one-hot resample materializes an O(Tb * Lbuf) intermediate per
    # band (~86 MB of transient per band at f32 by the crossover); the
    # threshold is shared with the flagship wrapper
    _ONEHOT_MAX_TB = _ONEHOT_MAX_TB_DEFAULT

    # measured same-window (r4): dense/onehot = 0.45x at B=16, 0.85x at
    # B=4, 1.02x (wash) at B=1 where reading the ~52 MB constant
    # dominates - so dense turns on from 4 streams up
    _DENSE_MIN_B = 4

    def _resample_kind(self, Tb: int, plan, B: int) -> str:
        """Pick the resample lowering for this plan: the prefolded dense
        matmul when the plan built it and the batch amortizes its
        constant read (fastest, r4: -47% of the 16-stream step), else
        the in-graph one-hot below the memory crossover, else the
        linear-memory gather."""
        if plan[9] is not None and B >= self._DENSE_MIN_B:
            return "dense"
        return "onehot" if Tb <= self._ONEHOT_MAX_TB else "gather"

    def _pitchshifter_impl(self, x, hkf, hki, rates, fo, ls, zero, W,
                           start, FO_max, pad_left, Lbuf, resample_kind):
        # the filterbank weights enter as TRACED ARGUMENTS, not closure
        # constants: a bound-method jit caches its trace, so reading
        # self.pqmf.hkf here would silently pin the weights at first-call
        # values and ignore a later pqmf.set_weights() (artifact restore
        # / fine-tune), unlike the flagship path
        pq = self.pqmf
        if self.n_band == 1:
            # StreamingPQMF's n_band==1 identity early-out (matching the
            # reference's PQMF passthrough, pqmf.py:250-251): the 1-band
            # "filterbank" is a passthrough, so only the shift runs —
            # running the 1-band conv here would change the output
            # (advisor r2)
            sub = x
        else:
            _, sub = _cached_analysis(x, hkf, _EMPTY, mode="offline",
                                      precision=pq.precision,
                                      use_pallas=pq.use_pallas,
                                      mesh=pq.mesh)  # [B, M, Tb]
        shifted = _fused_ta_pitchshift(
            sub, rates, fo, ls, zero, W, start, self._n_fft, self._hop,
            self._win, sub.shape[-1], FO_max, pad_left, Lbuf,
            resample_kind=resample_kind, precision=self.precision)
        if self.n_band == 1:
            return shifted
        _, y = _cached_synthesis(shifted, hki, _EMPTY, mode="offline",
                                 precision=pq.precision,
                                 use_pallas=pq.use_pallas, mesh=pq.mesh)
        return y

    def pitchshifter(self, x):
        """Decompose -> shift all bands -> reconstruct, as ONE jitted XLA
        program (the reference's 16-iteration loop fused; parity vs the
        literal loop is held >90 dB in tests/test_pipelines.py). Serving
        block sizes use the one-hot resample; whole-file inputs fall back
        to the linear-memory gather form inside the same fused program."""
        x = jnp.asarray(x)
        if x.ndim == 2:
            x = x[None]
        if not (x.ndim == 3 and x.shape[1] == 1):
            raise ValueError(
                "input must be [1, buffer_size] or [batch, 1, buffer_size]")
        T = x.shape[-1]
        _check_buffer(T, self.n_band, self.max_buffer_size)
        Tb = T // self.n_band
        plan = self._ta_plan(Tb)
        kind = self._resample_kind(Tb, plan, x.shape[0])
        if kind == "dense":
            W = _dense_device_cached(self._dense_dev, Tb, plan[9])
        else:
            W = plan[4]
        return self._pitchshifter_jit(x, self.pqmf.hkf, self.pqmf.hki,
                                      *plan[:4], W, plan[5],
                                      FO_max=plan[6],
                                      pad_left=plan[7], Lbuf=plan[8],
                                      resample_kind=kind)

    # -- literal per-band path (parity oracle for the fused one) -------------

    def pitchshifter_loop(self, x):
        """The reference's per-band dispatch structure, kept verbatim as
        the fused path's oracle (PQMFPsWrapper.py:114-150)."""
        subbands = self.forward(x)  # [B, M, Tb]
        target = subbands.shape[-1]
        out = []
        for i in range(self.n_band):
            band = subbands[:, i, :]
            shifted = self.pitch_shifters[i](band)[:, None, :]
            cur = shifted.shape[-1]
            if cur > target:
                start = (cur - target) // 2
                shifted = shifted[..., start:start + target]
            elif cur < target:
                pad = target - cur
                left = pad // 2
                # reference pads with reflect here (PQMFPsWrapper.py:142)
                shifted = jnp.pad(shifted,
                                  ((0, 0), (0, 0), (left, pad - left)),
                                  mode="reflect")
            out.append(shifted)
        shifted_subbands = jnp.concatenate(out, axis=1)
        return self.inverse(shifted_subbands)

    __call__ = forward
