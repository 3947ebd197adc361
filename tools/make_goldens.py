"""Generate the repo's own seeded golden outputs (committed regression
anchors).

The reference ships output wavs as implicit goldens (SURVEY.md §4 item 3)
but none are reproducible — their per-band shifts came from an unseeded
torch RNG at export time. These goldens fix that for THIS implementation:
deterministic seeds, fixed shifts, CPU backend (the test environment), so
any numeric drift in the kernels/DSP flips tests/test_golden.py even when
SNR-floor gates would still pass.

Regenerate (only after an intentional numerics change, with the diff
explained in the commit message):

    python tools/make_goldens.py
"""

from __future__ import annotations

import os
import sys

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "goldens")

# fixed shift set spanning the reference's uniform(-24.75, 12.43) export
# range (1-PitchShifterWrapper.py:331)
SHIFTS16 = [0, 4, -5, -12, 3, -7, 2, -3, 5, -9, 1, -1, -4, -6, -2, -24]


def _flute_blocks(n_blocks: int, block: int):
    from pqmf_tpu.utils.audio import read_wav

    x, sr = read_wav("/root/reference/audio/flute.wav")
    assert sr == 44100
    x = x[0, 44100: 44100 + n_blocks * block]  # past the attack, non-silent
    return x.reshape(n_blocks, 1, 1, block).astype(np.float32)


def main():
    os.makedirs(OUT, exist_ok=True)

    from pqmf_tpu.pipelines import (PQMFPitchShiftWrapper,
                                    PQMFPitchShiftWrapperTA, stream_ola)

    # 1. flagship pitchshift: two carried-state blocks of flute
    w = PQMFPitchShiftWrapper(100, 16, 8192, 44100, SHIFTS16)
    blocks = _flute_blocks(2, 8192)
    state = w.init_state()
    outs = []
    for b in blocks:
        state, y = w.pitchshift_fn(state, b)
        outs.append(np.asarray(y)[0])
    np.savez_compressed(
        os.path.join(OUT, "pvoc_pitchshift.npz"),
        y=np.stack(outs), tail=np.asarray(state["prev_tail"]),
        shifts=np.asarray(SHIFTS16))

    # 2. torchaudio-variant fused pitchshifter, one block
    wta = PQMFPitchShiftWrapperTA(100, 16, 8192, 44100, SHIFTS16)
    yta = np.asarray(wta.pitchshifter(blocks[0]))[0]
    np.savez_compressed(os.path.join(OUT, "ta_pitchshift.npz"), y=yta)

    # 3. the block harness (2-TestBlocks analog) as one scanned program
    xs = _flute_blocks(3, 8192).reshape(1, -1)
    w2 = PQMFPitchShiftWrapper(100, 16, 4096, 44100, SHIFTS16)
    pitch, recon = stream_ola(w2, xs, block=4096)
    np.savez_compressed(
        os.path.join(OUT, "blocks_stream.npz"),
        pitch=np.asarray(pitch)[0], recon=np.asarray(recon)[0])

    # 4. raw filterbank round trip (subbands + reconstruction)
    from pqmf_tpu import PQMF

    pq = PQMF(100, 16, use_pallas=False)
    xr = _flute_blocks(1, 8192).reshape(1, 1, -1)
    sub = np.asarray(pq.forward(xr))
    rec = np.asarray(pq.inverse(sub))
    np.savez_compressed(os.path.join(OUT, "pqmf_roundtrip.npz"),
                        sub=sub[0], rec=rec[0])

    for f in sorted(os.listdir(OUT)):
        print(f, os.path.getsize(os.path.join(OUT, f)), "bytes")


if __name__ == "__main__":
    main()
