"""Native (C) host-side data layer — see ``wavio.c``.

``get()`` returns the compiled ``_pqmf_wavio`` module, building it on
first use if a C compiler is available, or ``None`` (callers fall back to
NumPy). The extension is the framework's analog of the reference's
torchaudio C++ I/O backends (VocoderPitchShifter.py:309-344).
"""

from __future__ import annotations

import importlib
import os
import subprocess
import sys
import sysconfig

_HERE = os.path.dirname(os.path.abspath(__file__))
_mod = None
_tried = False


def _so_path() -> str:
    suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    return os.path.join(_HERE, "_pqmf_wavio" + suffix)


def build(quiet: bool = True) -> bool:
    """Compile wavio.c into _pqmf_wavio in-place. Returns success."""
    so = _so_path()
    src = os.path.join(_HERE, "wavio.c")
    if os.path.exists(so) and os.path.getmtime(so) >= os.path.getmtime(src):
        return True
    cc = os.environ.get("CC", "cc")
    include = sysconfig.get_path("include")
    cmd = [cc, "-O3", "-shared", "-fPIC", f"-I{include}", src, "-o", so]
    try:
        res = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
    except (OSError, subprocess.TimeoutExpired):
        return False
    if res.returncode != 0 and not quiet:
        sys.stderr.write(res.stderr)
    return res.returncode == 0


def get():
    """The native module, building lazily; None if unavailable."""
    global _mod, _tried
    if _mod is not None or _tried:
        return _mod
    _tried = True
    if not build():
        return None
    if _HERE not in sys.path:
        sys.path.insert(0, _HERE)
    try:
        _mod = importlib.import_module("_pqmf_wavio")
    except ImportError:
        _mod = None
    return _mod
