"""Build the native extensions: g++ -O3 -shared -> libdsjax.so.

Usage: python -m dsjax.cpp.build [--debug]
No cmake/pybind11 required; bindings are ctypes (see beam_binding.py).
"""

from __future__ import annotations

import os
import subprocess
import sys

SRC_DIR = os.path.join(os.path.dirname(__file__), "src")
LIB_DIR = os.path.join(os.path.dirname(__file__), "lib")
LIB_PATH = os.path.join(LIB_DIR, "libdsjax.so")

SOURCES = ["lm.cpp", "beam.cpp", "flac.cpp", "audio_decode.cpp"]


def build(debug: bool = False, verbose: bool = True) -> str:
    os.makedirs(LIB_DIR, exist_ok=True)
    srcs = [os.path.join(SRC_DIR, s) for s in SOURCES
            if os.path.exists(os.path.join(SRC_DIR, s))]
    flags = ["-std=c++17", "-fPIC", "-shared", "-Wall"]
    flags += ["-g", "-O0"] if debug else ["-O3", "-funroll-loops"]
    cmd = ["g++", *flags, *srcs, "-o", LIB_PATH]
    if verbose:
        print(" ".join(cmd))
    subprocess.check_call(cmd)
    return LIB_PATH


def ensure_built() -> str:
    """Build iff missing or stale; returns the lib path."""
    srcs = [os.path.join(SRC_DIR, s) for s in SOURCES
            if os.path.exists(os.path.join(SRC_DIR, s))]
    if os.path.exists(LIB_PATH):
        lib_mtime = os.path.getmtime(LIB_PATH)
        if all(os.path.getmtime(s) <= lib_mtime for s in srcs):
            return LIB_PATH
    return build(verbose=False)


if __name__ == "__main__":
    build(debug="--debug" in sys.argv)
