"""Native (C) runtime components, compiled on demand with a Python fallback.

The reference's native layer is its binary dependency stack (SURVEY.md
section 2c); the one hot *host-side* path worth native code here is trace
mining (multi-GB XSpace protobufs). ``get_xplane_fast()`` builds/loads the C
scanner; callers fall back to the pure-Python decoder when no compiler is
available.
"""

from __future__ import annotations

import os
import subprocess
import sysconfig

_CACHED = None
_TRIED = False


def get_xplane_fast():
    """Return the compiled xplane_fast module, building it on first use;
    None if unavailable (callers use the pure-Python path)."""
    global _CACHED, _TRIED
    if _TRIED:
        return _CACHED
    _TRIED = True
    here = os.path.dirname(__file__)
    src = os.path.join(here, "xplane_fast.c")
    ext = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    out = os.path.join(here, "xplane_fast" + ext)
    try:
        if (not os.path.exists(out)) or os.path.getmtime(out) < os.path.getmtime(src):
            include = sysconfig.get_paths()["include"]
            cmd = [
                os.environ.get("CC", "cc"), "-O2", "-shared", "-fPIC",
                f"-I{include}", src, "-o", out,
            ]
            subprocess.run(cmd, check=True, capture_output=True)
        import importlib.util

        spec = importlib.util.spec_from_file_location("xplane_fast", out)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        _CACHED = mod
    except Exception:
        _CACHED = None
    return _CACHED
