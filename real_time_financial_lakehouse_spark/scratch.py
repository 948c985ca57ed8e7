"""Scratch-directory helper for roundtrip sinks / checkpoints.

The streaming roundtrip queries measure plan + state-store cost, but a
disk-backed /tmp adds fsync latency on every checkpoint commit that no
production deployment would see on the DRIVER (real checkpoints live in
object storage with their own semantics).  When a tmpfs is available
(/dev/shm on Linux), scratch output and checkpoints go there -- same
filesystem API, no rotational/fsync tax.  Falls back to the platform
default tempdir otherwise.  Override with $RTFL_SCRATCH_DIR.
"""

from __future__ import annotations

import os
import tempfile

def _base() -> str | None:
    env = os.environ.get("RTFL_SCRATCH_DIR")
    if env:
        return env
    shm = "/dev/shm"
    if os.path.isdir(shm) and os.access(shm, os.W_OK):
        return shm
    return None  # tempfile default

def scratch_dir(prefix: str) -> str:
    """mkdtemp on the fastest available scratch filesystem."""
    return tempfile.mkdtemp(prefix=prefix, dir=_base())
