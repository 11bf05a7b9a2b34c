"""Build the native library: g++ -O3 -shared -fPIC nifti_reader.cpp -lz.

Usage: ``python -m glfusion_tpu.native.build``. Also invoked lazily by
``glfusion_tpu.native.loader`` when the .so is missing.

The output filename embeds a hash of the C++ source, so a source change
always builds (and loads) a fresh path: dlopen caches handles per path
while a process holds them, which made rewrite-in-place rebuilds return
the stale library. Older revisions are removed on successful build.
"""

from __future__ import annotations

import hashlib
import subprocess
import sys
from pathlib import Path

SRC_DIR = Path(__file__).parent
SRC_PATH = SRC_DIR / "nifti_reader.cpp"


def _src_tag() -> str:
    return hashlib.sha256(SRC_PATH.read_bytes()).hexdigest()[:10]


def so_path() -> Path:
    """The versioned library path for the CURRENT source revision."""
    return SRC_DIR / f"libglnative-{_src_tag()}.so"


def build(verbose: bool = True) -> bool:
    out = so_path()
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        str(SRC_PATH), "-o", str(out), "-lz", "-lpthread",
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
    for old in SRC_DIR.glob("libglnative*.so"):
        if old != out:
            try:
                old.unlink()
            except OSError:
                pass  # still mapped by another process; harmless leftover
    return True


if __name__ == "__main__":
    ok = build()
    print(f"built {so_path()}" if ok else "build FAILED")
    raise SystemExit(0 if ok else 1)
