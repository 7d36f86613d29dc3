"""Driver-environment parity (round-7 regression guard).

The verification driver runs declared queries on a STOCK
``SparkSession.builder.getOrCreate()`` — no Hive catalog, no repo conf
pins, arbitrary cwd. Rounds 5-6 shipped queries that passed on the repo's
``get_session`` (Hive-enabled) but failed under the driver: Spark's script
transform serializes its INPUT with ``\\x01`` field delimiters on a
non-Hive session but ``\\t`` on a Hive one, so ``TRANSFORM ... USING
'/bin/cat'`` (input14.q) and ``USING 'tr \\t _'`` (insert_into1-6.q)
returned different bytes per session type. The fix pins an explicit input
``ROW FORMAT`` in the qfile rewrite; this test replays the affected
queries in a SUBPROCESS whose session is built exactly like the driver's
(stock builder, scratch cwd) so any session-dependent plan regression
fails here before it fails under the driver.

A subprocess is required: the in-process test session is Hive-enabled and
SparkSessions are process-global singletons.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# the round-6 driver-red set: script-transform qfiles whose results
# depended on the session type before the input-row-format pin
DRIVER_RED_R6 = [
    "qfile_input14",
    "qfile_insert_into1",
    "qfile_insert_into4",
]

_SCRIPT = """
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession

spark = (SparkSession.builder.master("local[4]")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

import hashlib

import __spark_entry__ as entry_mod

qs = entry_mod.queries()
for name in {names!r}:
    df = qs[name](spark, "/root/testdata/sf0.001")
    rows = sorted(tuple(str(c) for c in r) for r in df.collect())
    digest = hashlib.md5(repr(rows).encode()).hexdigest()
    print("RESULT", name, len(rows), digest, flush=True)
"""


@pytest.mark.slow
def test_driver_red_queries_match_under_vanilla_session(tmp_path, spark):
    """The r6 driver-red queries must return IDENTICAL rows on a stock
    non-Hive session (scratch cwd) and on the repo's pinned session."""
    # expected rows from the in-process (Hive-enabled, pinned) session
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    expected = {}
    for name in DRIVER_RED_R6:
        df = qs[name](spark, "/root/testdata/sf0.001")
        expected[name] = sorted(
            tuple(str(c) for c in r) for r in df.collect())

    script = _SCRIPT.format(repo=REPO, names=DRIVER_RED_R6)
    proc = subprocess.run(
        [sys.executable, "-c", script],
        cwd=tmp_path,  # scratch cwd: no repo files, no stale warehouse
        capture_output=True, text=True, timeout=900,
        env={**os.environ, "PYTHONPATH": ""},
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    import hashlib

    got = {}
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT "):
            _, name, nrows, h = line.split()
            got[name] = (int(nrows), h)
    for name in DRIVER_RED_R6:
        assert name in got, f"{name} missing from vanilla-session run"
        exp = (len(expected[name]),
               hashlib.md5(repr(expected[name]).encode()).hexdigest())
        assert got[name] == exp, (
            f"{name}: vanilla-session result diverges from pinned-session "
            f"result (rows/hash {got[name]} vs {exp})")
