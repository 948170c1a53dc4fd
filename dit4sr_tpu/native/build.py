"""Build the native host-side library: `python -m dit4sr_tpu.native.build`."""

import os
import subprocess
import sys

HERE = os.path.dirname(__file__)


def build() -> str:
    src = [os.path.join(HERE, "lap.cpp"), os.path.join(HERE, "imgio.cpp")]
    out = os.path.join(HERE, "libdit4sr_native.so")
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC",
        "-std=c++17", *src, "-o", out, "-ljpeg", "-lpthread",
    ]
    subprocess.run(cmd, check=True)
    return out


if __name__ == "__main__":
    path = build()
    print(f"built {path}", file=sys.stderr)
