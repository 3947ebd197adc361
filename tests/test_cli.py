"""CLI smoke tests (small configs, CPU) — the reference's executable
__main__ smoke tests (SURVEY.md §4 item 1) as actual pytest cases."""

import json
import os

import numpy as np
import pytest

from pqmf_tpu.utils.audio import read_wav, write_wav

FLUTE = "/root/reference/audio/flute.wav"


@pytest.fixture(scope="module")
def short_wav(tmp_path_factory):
    """2-second mono clip so CLI runs stay fast."""
    x, sr = read_wav(FLUTE)
    p = tmp_path_factory.mktemp("cli") / "short.wav"
    write_wav(str(p), x[:1, : 2 * sr], sr)
    return str(p)


def test_blocks_cli(short_wav, tmp_path, capsys):
    from pqmf_tpu.cli import blocks

    blocks.main([short_wav, "--block", "1024", "--n_band", "8",
                 "--buffer", "1024", "--seed", "1",
                 "--out_prefix", str(tmp_path / "bt")])
    out = capsys.readouterr().out
    assert "RMS orig:" in out and "RMS full_pitch:" in out
    assert (tmp_path / "bt_pitchshifter.wav").exists()
    assert (tmp_path / "bt_recontructed.wav").exists()
    assert (tmp_path / "nonblock_pitchshifter.wav").exists()
    # stream reconstruction preserves energy
    lines = {l.split(":")[0]: float(l.split(":")[1])
             for l in out.splitlines() if l.startswith("RMS")}
    assert abs(lines["RMS orig"] - lines["RMS stream_recon"]) < 0.01


def test_blocks_cli_artifact_path(short_wav, tmp_path, capsys):
    from pqmf_tpu.cli import blocks
    from pqmf_tpu.export import save_artifact
    from pqmf_tpu.pipelines import PQMFPitchShiftWrapper

    w = PQMFPitchShiftWrapper(70, 8, 1024, 44100, list(range(8)))
    art = str(tmp_path / "art")
    save_artifact(w, art)
    blocks.main([short_wav, "--block", "1024",
                 "--artifact", art, "--out_prefix", str(tmp_path / "a")])
    out = capsys.readouterr().out
    assert "loaded artifact" in out and "RMS full_pitch:" in out


@pytest.mark.slow  # full TA export CLI (~50 s); blocks/vocoder CLIs stay fast
def test_ps_torchaudio_cli(short_wav, tmp_path, capsys):
    from pqmf_tpu.cli import ps_torchaudio

    ps_torchaudio.main([short_wav, "--n_band", "8", "--buffer", "2048",
                        "--shifts", "0,2,-2,12,-12,5,-5,7",
                        "--out_dir", str(tmp_path)])
    out = capsys.readouterr().out
    assert "RMS shifted:" in out
    assert (tmp_path / "reconstruido.wav").exists()
    assert (tmp_path / "ta_pitchshifted.wav").exists()


def test_vocoder_cli(short_wav, tmp_path, capsys):
    from pqmf_tpu.cli import vocoder

    out_path = str(tmp_path / "shifted.wav")
    vocoder.main([short_wav, out_path, "--n_steps", "-5",
                  "--n_fft", "512", "--hop_length", "128",
                  "--win_length", "512"])
    assert os.path.exists(out_path)
    y, sr = read_wav(out_path)
    x, _ = read_wav(short_wav)
    assert y.shape[-1] == x.shape[-1]


def test_export_pqmf_cli(short_wav, tmp_path, capsys):
    from pqmf_tpu.cli import export_pqmf

    export_pqmf.main(["--input", short_wav, "--n_band", "8",
                      "--buffer", "1024",
                      "--out_dir", str(tmp_path / "art"),
                      "--audio_dir", str(tmp_path / "audio")])
    assert (tmp_path / "art" / "manifest.json").exists()
    m = json.loads((tmp_path / "art" / "manifest.json").read_text())
    assert m["kind"] == "PQMFWrapper" and m["config"]["n_band"] == 8


def test_export_pqmf_cli_finetuned(short_wav, tmp_path, capsys):
    """--finetuned installs the committed bank; its weights ride in the
    artifact (reload uses them, not the designed Kaiser bank)."""
    import numpy as np

    from pqmf_tpu.cli import export_pqmf
    from pqmf_tpu.export import load_artifact
    from pqmf_tpu.parallel.training import load_pretrained_bank

    export_pqmf.main(["--input", short_wav, "--n_band", "8",
                      "--buffer", "1024", "--finetuned",
                      "--out_dir", str(tmp_path / "art"),
                      "--audio_dir", str(tmp_path / "audio")])
    loaded, _ = load_artifact(str(tmp_path / "art"))
    want = np.asarray(load_pretrained_bank("hk8_atten100_finetuned")["hk"])
    np.testing.assert_array_equal(np.asarray(loaded.pqmf.params["hk"]),
                                  want)

    # no committed bank for this config -> clear error naming the options
    import pytest

    with pytest.raises(FileNotFoundError, match="available"):
        export_pqmf.main(["--input", short_wav, "--n_band", "4",
                          "--buffer", "1024", "--finetuned",
                          "--out_dir", str(tmp_path / "art4"),
                          "--audio_dir", str(tmp_path / "audio")])


def test_export_pvoc_cli(short_wav, tmp_path, capsys):
    from pqmf_tpu.cli import export_pvoc

    export_pvoc.main(["--input", short_wav, "--n_band", "8",
                      "--buffer", "1024", "--seed", "3",
                      "--out_dir", str(tmp_path / "art"),
                      "--audio_dir", str(tmp_path / "audio"),
                      "--save_audio"])
    out = capsys.readouterr().out
    assert "pitchshift output shape" in out
    assert (tmp_path / "art" / "manifest.json").exists()
    assert (tmp_path / "art" / "weights.npz").exists()
    assert (tmp_path / "audio" / "phasevocoder.wav").exists()
    m = json.loads((tmp_path / "art" / "manifest.json").read_text())
    assert m["kind"] == "PQMFPitchShiftWrapper"


def test_realtime_demo_runs(tmp_path):
    """The README/CLAUDE.md-advertised realtime example runs end to end
    on CPU (block loop + one-scan OLA + multi-stream serving) on a short
    input (VERDICT r3 weak-5: demo rot was silent)."""
    import subprocess
    import sys

    x, sr = read_wav(FLUTE)
    p = tmp_path / "short.wav"
    write_wav(str(p), x[:1, 30000:30000 + sr // 2], sr)
    r = subprocess.run(
        [sys.executable, "examples/realtime_demo.py", str(p), "--cpu"],
        capture_output=True, text=True, timeout=600, cwd="/root/repo")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "1. block loop" in r.stdout
    assert "2. one-scan OLA stream" in r.stdout
    assert "3. 16-stream step" in r.stdout
    assert "wrote /tmp/demo_pitchshift.wav" in r.stdout


def test_finetune_demo_runs(tmp_path):
    """The fine-tune example runs a tiny 2-step tune on CPU and saves a
    loadable bank."""
    import subprocess
    import sys

    out = tmp_path / "demo_bank.npz"
    r = subprocess.run(
        [sys.executable, "examples/finetune_demo.py", "--cpu",
         "--steps", "2", "--batch", "2", "--length", "4096",
         "--n_band", "8", "--out", str(out)],
        capture_output=True, text=True, timeout=600, cwd="/root/repo")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "designed bank" in r.stdout
    assert "fine-tuned bank" in r.stdout
    z = np.load(str(out))
    assert z["hk"].shape == (8, 256) and np.isfinite(z["hk"]).all()


def test_serving_demo_runs(tmp_path, monkeypatch):
    """The serving example (export -> AOT reload -> multi-stream scan)
    runs end to end on CPU."""
    import subprocess
    import sys

    r = subprocess.run(
        [sys.executable, "examples/serving_demo.py", "--cpu",
         "--streams", "2", "--blocks", "2", "--buffer", "1024",
         "--n_band", "8"],
        capture_output=True, text=True, timeout=600, cwd="/root/repo")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "AOT == live wrapper" in r.stdout
    assert "finite: True" in r.stdout


@pytest.fixture(scope="module")
def short_stereo_wav(tmp_path_factory):
    """1-second stereo clip (two distinct channels)."""
    x, sr = read_wav(FLUTE)
    stereo = np.concatenate([x[:1, :sr], 0.5 * x[:1, sr:2 * sr]], axis=0)
    p = tmp_path_factory.mktemp("cli_st") / "stereo.wav"
    write_wav(str(p), stereo, sr)
    return str(p)


def test_blocks_cli_stereo(short_stereo_wav, tmp_path, capsys):
    """--stereo keeps both channels end-to-end (per-channel serving
    streams; the reference mixes down)."""
    from pqmf_tpu.cli import blocks

    blocks.main([short_stereo_wav, "--block", "1024", "--n_band", "8",
                 "--buffer", "1024", "--seed", "1", "--stereo",
                 "--out_prefix", str(tmp_path / "st")])
    out = capsys.readouterr().out
    assert "RMS orig:" in out and "RMS full_pitch:" in out
    y, _ = read_wav(str(tmp_path / "st_pitchshifter.wav"))
    assert y.shape[0] == 2 and np.isfinite(y).all()
    r, _ = read_wav(str(tmp_path / "st_recontructed.wav"))
    assert r.shape[0] == 2
    f, _ = read_wav(str(tmp_path / "nonblock_pitchshifter.wav"))
    assert f.shape[0] == 2


def test_finetune_bank_tool_smoke(tmp_path, capsys):
    """tools/finetune_bank.py end-to-end on CPU with a 2-step run: prints
    designed + tuned SNR for all three fixtures and writes a loadable npz
    (extension appended when missing — np.savez would do it silently)."""
    import sys

    tools_dir = os.path.join(os.path.dirname(__file__), "..", "tools")
    sys.path.insert(0, tools_dir)
    try:
        import finetune_bank
    finally:
        # remove by VALUE: importing finetune_bank runs its module-level
        # sys.path.insert(0, repo_root), so pop(0) would remove that and
        # leave tools/ on sys.path for the rest of the session (where
        # e.g. `roofline` could shadow later imports)
        sys.path.remove(tools_dir)

    out = tmp_path / "bank"  # no .npz on purpose
    finetune_bank.main(["--n_band", "8", "--steps", "2", "--batch", "2",
                        "--length", "4096", "--out", str(out), "--cpu"])
    text = capsys.readouterr().out
    assert text.count("flute.wav") == 2  # designed + fine-tuned
    saved = tmp_path / "bank.npz"
    assert f"saved {saved}" in text
    z = np.load(str(saved))
    # M=8 @ atten=100: 189-tap prototype -> pow-2 pad to 256 (BASELINE.md)
    assert z["hk"].shape == (8, 256) and np.isfinite(z["hk"]).all()
