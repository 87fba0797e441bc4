"""Build the native IO extension (vpt/io/_ppmio.c) in place.

Run: python -m vpt.io.build_native
The extension is optional — vpt/io/ppm.py falls back to pure Python when it
is absent; this builder needs only the system compiler (no pip).
"""
from __future__ import annotations

import os
import shutil
import subprocess
import sys
import sysconfig
import tempfile

HERE = os.path.dirname(os.path.abspath(__file__))


def build(verbose: bool = True) -> str | None:
    src = os.path.join(HERE, "_ppmio.c")
    suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    out = os.path.join(HERE, "_ppmio" + suffix)
    cc = (sysconfig.get_config_var("CC") or "cc").split()[0]
    include = sysconfig.get_paths()["include"]
    with tempfile.TemporaryDirectory() as tmp:
        obj = os.path.join(tmp, "_ppmio.o")
        so = os.path.join(tmp, "_ppmio.so")
        cmds = [
            [cc, "-O2", "-fPIC", f"-I{include}", "-c", src, "-o", obj],
            [cc, "-shared", obj, "-lm", "-o", so],
        ]
        for cmd in cmds:
            r = subprocess.run(cmd, capture_output=True, text=True)
            if r.returncode != 0:
                if verbose:
                    print(r.stderr, file=sys.stderr)
                return None
        shutil.copy2(so, out)
    if verbose:
        print(f"built {out}")
    return out


if __name__ == "__main__":
    sys.exit(0 if build() else 1)
