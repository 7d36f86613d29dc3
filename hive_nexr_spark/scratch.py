"""Concurrency-safe scratch directories for operators that stage data on
local disk (CDC landing, hypertable rollups, persisted ANN indexes).

One recipe, one place (r9 review: three drifting copies existed): a
per-PROCESS root keyed by pid — so concurrent sweeps/benches never race
overwrite-vs-read on a shared path — removed at interpreter exit, with a
fresh uuid subdir per call so earlier calls' returned DataFrames stay
readable (lazy consumers are never invalidated by a later call).
"""

from __future__ import annotations

import atexit
import os
import shutil
import uuid

_ROOT = "/tmp/hive_nexr_spark_scratch"


def process_scratch_dir(kind: str) -> str:
    """A unique scratch path ``<root>/<kind>_<pid>/<uuid8>`` whose
    per-process parent is rmtree'd at exit. The parent's cleanup is
    registered once, BEFORE first use, keyed on directory existence."""
    root = os.path.join(_ROOT, f"{kind}_{os.getpid()}")
    if not os.path.isdir(root):
        atexit.register(shutil.rmtree, root, ignore_errors=True)
    return os.path.join(root, uuid.uuid4().hex[:8])
