"""Build the native library: g++ -O3 -shared -fPIC nifti_reader.cpp -lz.

Usage: ``python -m glfusion_tpu.native.build``. Also invoked lazily by
``glfusion_tpu.native.loader`` when the .so is missing.
"""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

SRC_DIR = Path(__file__).parent
SO_PATH = SRC_DIR / "libglnative.so"


def build(verbose: bool = True) -> bool:
    src = SRC_DIR / "nifti_reader.cpp"
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        str(src), "-o", str(SO_PATH), "-lz", "-lpthread",
    ]
    try:
        res = subprocess.run(cmd, capture_output=True, text=True,
                             timeout=120)
    except (OSError, subprocess.TimeoutExpired) as e:
        if verbose:
            print(f"[glfusion native] build failed to launch: {e}",
                  file=sys.stderr)
        return False
    if res.returncode != 0:
        if verbose:
            print(f"[glfusion native] build failed:\n{res.stderr}",
                  file=sys.stderr)
        return False
    return True


if __name__ == "__main__":
    ok = build()
    print(f"built {SO_PATH}" if ok else "build FAILED")
    raise SystemExit(0 if ok else 1)
