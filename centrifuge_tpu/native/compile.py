"""Shared native-extension builder: compile-on-first-use, cached by
source content hash.

mtime-based caching broke after fresh clones (checkout mtimes made a
stale committed binary look current); hashing the source into the
artifact name makes the cache correct by construction, and binaries are
no longer committed (.gitignore'd).
"""

from __future__ import annotations

import hashlib
import os
import subprocess
import tempfile


def build_native(src_path: str, extra_flags=()) -> str:
    """Compile src_path to a shared object named by its content hash;
    return the .so path. Stale hashes for the same source are removed."""
    d = os.path.dirname(os.path.abspath(src_path))
    stem = os.path.splitext(os.path.basename(src_path))[0]
    with open(src_path, "rb") as f:
        h = hashlib.sha256(f.read()).hexdigest()[:12]
    so_path = os.path.join(d, f"_{stem}.{h}.so")
    if not os.path.exists(so_path):
        with tempfile.TemporaryDirectory() as td:
            tmp = os.path.join(td, "x.so")
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", src_path, "-o", tmp,
                 *extra_flags],
                check=True, capture_output=True)
            os.replace(tmp, so_path)
        for fn in os.listdir(d):
            if (fn.startswith(f"_{stem}.") and fn.endswith(".so")
                    and fn != os.path.basename(so_path)):
                try:
                    os.unlink(os.path.join(d, fn))
                except OSError:
                    pass
    return so_path
