"""Build the native extensions: ``python -m e2e_tts_tpu.native.build``."""

from __future__ import annotations

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
SOURCES = {"yin": "yin.cc"}


def lib_path(name: str) -> str:
    return os.path.join(HERE, f"lib{name}.so")


def build(name: str, force: bool = False) -> str:
    src = os.path.join(HERE, SOURCES[name])
    out = lib_path(name)
    if not force and os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(src):
        return out
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC",
        "-o", out, src,
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    return out


def build_all(force: bool = False):
    return {name: build(name, force) for name in SOURCES}


if __name__ == "__main__":
    force = "--force" in sys.argv
    for name, path in build_all(force).items():
        print(f"built {name}: {path}")
