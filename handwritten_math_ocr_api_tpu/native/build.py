"""Build the native library: ``python -m handwritten_math_ocr_api_tpu.native.build``.

Compiles src/mathocr_native.cpp into libmathocr_native.so next to this
package with g++ (no external deps). Idempotent: skips the build when the
.so is newer than the source unless --force.
"""

from __future__ import annotations

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
SRCS = [os.path.join(HERE, "src", "mathocr_native.cpp"),
        os.path.join(HERE, "src", "stroke_render.cpp")]
OUT = os.path.join(HERE, "libmathocr_native.so")


def build(force: bool = False, quiet: bool = False) -> str:
    if not force and os.path.exists(OUT) and \
            os.path.getmtime(OUT) >= max(os.path.getmtime(s)
                                         for s in SRCS):
        if not quiet:
            print(f"up to date: {OUT}")
        return OUT
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
        "-Wall", "-Wextra", *SRCS, "-o", OUT,
    ]
    if not quiet:
        print(" ".join(cmd))
    subprocess.run(cmd, check=True)
    return OUT


if __name__ == "__main__":
    build(force="--force" in sys.argv)
