"""Build the native libraries (g++ → .so). Idempotent: rebuilds only when
the source is newer than the artifact. Called lazily on first import of the
binary streams backend; can also be run directly:

    python native/build.py
"""

from __future__ import annotations

import subprocess
from pathlib import Path

NATIVE_DIR = Path(__file__).resolve().parent

LIBS = {
    "streamcodec": ["streamcodec.cpp"],
}


def build(name: str) -> Path:
    sources = [NATIVE_DIR / s for s in LIBS[name]]
    out = NATIVE_DIR / f"lib{name}.so"
    if out.exists() and all(out.stat().st_mtime >= s.stat().st_mtime for s in sources):
        return out
    cmd = [
        "g++",
        "-O2",
        "-shared",
        "-fPIC",
        "-std=c++17",
        "-o",
        str(out),
        *[str(s) for s in sources],
    ]
    subprocess.run(cmd, check=True, capture_output=True, text=True)
    return out


def build_all() -> None:
    for name in LIBS:
        print(f"built {build(name)}")


if __name__ == "__main__":
    build_all()
