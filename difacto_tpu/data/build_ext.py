"""Build the native ingest library: ``python -m difacto_tpu.data.build_ext``.

Compiles ``csrc/libsvm_parser.cpp`` + ``csrc/localizer.cpp`` into
``difacto_tpu/data/_libsvm_native.so`` with g++ (no external deps).
Everything degrades to the NumPy engines when the library is absent, so
this is optional but recommended for ingest throughput (the reference's
dmlc-core parser and localizer are native C++ for the same reason).
"""

from __future__ import annotations

import os
import subprocess
import sys


def build(verbose: bool = True) -> str | None:
    here = os.path.dirname(os.path.abspath(__file__))
    repo = os.path.dirname(os.path.dirname(here))
    srcs = [
        os.path.join(repo, "csrc", "libsvm_parser.cpp"),
        os.path.join(repo, "csrc", "localizer.cpp"),
    ]
    out = os.path.join(here, "_libsvm_native.so")
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        "-pthread", *srcs, "-o", out,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        if verbose:
            msg = getattr(e, "stderr", str(e))
            print(f"native parser build failed (numpy engine will be used):\n{msg}")
        return None
    if verbose:
        print(f"built {out}")
    return out


if __name__ == "__main__":
    sys.exit(0 if build() else 1)
