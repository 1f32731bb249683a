"""Host-environment session helpers shared by bench.py / jobs / tests."""

from __future__ import annotations

import os
import shutil


def pick_local_dir(min_free_bytes: int = 8 << 30) -> str | None:
    """Choose Spark's shuffle/spill directory (``spark.local.dir``).

    - ``DFF_LOCAL_DIR`` always wins (explicit opt-in or opt-out).
    - ``/dev/shm/spark-local`` is used only when /dev/shm has at least
      ``min_free_bytes`` free.  On this sandbox the disk writes at
      ~15 MB/s (see jobs/validate.py), so tmpfs restores the local-SSD
      behavior every real cluster node has; but unconditionally spilling
      GB-scale shuffles into tmpfs on a normal host consumes RAM and can
      OOM it — the capacity gate keeps the default safe off-sandbox
      (round-2 advisor finding).
    - otherwise ``None``: leave Spark's default (the system temp dir).
    """
    explicit = os.environ.get("DFF_LOCAL_DIR")
    if explicit:
        try:
            os.makedirs(explicit, exist_ok=True)
            return explicit
        except OSError:
            return None
    shm = "/dev/shm"
    try:
        if shutil.disk_usage(shm).free >= min_free_bytes:
            d = os.path.join(shm, "spark-local")
            os.makedirs(d, exist_ok=True)
            return d
    except OSError:
        pass
    return None
