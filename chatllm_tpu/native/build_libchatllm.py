"""Build libchatllm.so — the C ABI shared library (native/libchatllm.cpp).

Usage: python -m chatllm_tpu.native.build_libchatllm [out_dir]
Links against the running interpreter's libpython (python3-config --embed)
so the library works both embedded into C/Nim hosts and ctypes-loaded from
Python (the reference bindings do the latter).
"""
from __future__ import annotations

import os
import subprocess
import sys
import sysconfig

_DIR = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(_DIR, "libchatllm.cpp")


def build(out_dir: str | None = None) -> str:
    out_dir = out_dir or _DIR
    out = os.path.join(out_dir, "libchatllm.so")
    if (os.path.exists(out)
            and os.path.getmtime(out) >= os.path.getmtime(SRC)):
        return out
    inc = sysconfig.get_path("include")
    libdir = sysconfig.get_config_var("LIBDIR")
    pyver = f"python{sys.version_info.major}.{sys.version_info.minor}"
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", "-pthread",
           f"-I{inc}", SRC, "-o", out + ".tmp",
           f"-L{libdir}", f"-l{pyver}", "-ldl",
           f"-Wl,-rpath,{libdir}"]
    r = subprocess.run(cmd, capture_output=True, timeout=300, text=True)
    if r.returncode != 0:
        # surface the compiler diagnostics — CalledProcessError alone
        # hides the actual g++ error behind "exit status 1"
        raise RuntimeError(
            f"libchatllm build failed (rc={r.returncode}):\n"
            f"$ {' '.join(cmd)}\n{r.stderr}")
    os.replace(out + ".tmp", out)
    return out


if __name__ == "__main__":
    print(build(sys.argv[1] if len(sys.argv) > 1 else None))
