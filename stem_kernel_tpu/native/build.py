"""Build the native shared library: python -m stem_kernel_tpu.native.build."""

from __future__ import annotations

import os
import subprocess
import sys


def build(verbose: bool = True, force: bool = False) -> str:
    here = os.path.dirname(__file__)
    out = os.path.join(here, "libsktnative.so")
    srcs = [os.path.join(here, f) for f in ("smo.cpp", "dagscan.cpp")]
    if not force and os.path.exists(out):
        if os.path.getmtime(out) >= max(os.path.getmtime(s) for s in srcs):
            return out  # up to date
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-o", out, *srcs]
    if verbose:
        print(" ".join(cmd), file=sys.stderr)
    subprocess.run(cmd, check=True)
    return out


if __name__ == "__main__":
    build()
