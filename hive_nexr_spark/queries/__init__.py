"""Declared query inventory — the driver-facing surface.

Each submodule exposes ``QUERIES: dict[str, callable(spark, sf_dir) -> DataFrame]``
and ``ORACLE: dict[str, str]`` (DuckDB ANSI SQL). Keys are stable operator
names mapped 1:1 to SURVEY.md §2 inventory rows; entries without an oracle
are non-SQL-expressible ops (driver records a rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


def _latest_driver_status() -> dict[str, tuple[bool, str | None]]:
    """Map query key -> (green, err) from the LATEST round that sampled it.

    Reads the committed ``CORRECTNESS_r*.json`` files at the repo root (the
    verification driver's own output), newest round last (numeric round
    order — lexicographic would put r100 before r11). Keys never sampled
    are absent. Green means a full hash match; ``err`` carries the driver's
    error tag (e.g. ``no_oracle`` for rows-only checks). Failure to read
    the files (fresh clone, odd cwd) degrades to "nothing verified yet",
    which only affects ordering, never membership.
    """
    import glob
    import json
    import os
    import re

    root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))

    def round_no(path: str) -> int:
        m = re.search(r"CORRECTNESS_r(\d+)", os.path.basename(path))
        return int(m.group(1)) if m else -1

    status: dict[str, tuple[bool, str | None]] = {}
    try:
        paths = sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json")),
                       key=round_no)
        for path in paths:
            with open(path) as fh:
                rows = json.load(fh)
            for k, v in rows.items():
                if isinstance(v, dict):
                    status[k] = (bool(v.get("hash_match")), v.get("err"))
    except Exception:
        return {}
    return status


def _next_round_no() -> int:
    """The upcoming driver round number (latest committed
    ``CORRECTNESS_r*.json`` + 1) — drives the tier-2 green-rotation offset
    so the rotation advances exactly once per round."""
    import glob
    import os
    import re

    root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    rounds = [
        int(m.group(1))
        for p in glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))
        if (m := re.search(r"CORRECTNESS_r(\d+)", os.path.basename(p)))
    ]
    return (max(rounds) + 1) if rounds else 0


def collect_all() -> tuple[dict[str, QueryFn], dict[str, str]]:
    """Assemble the inventory, never-driver-verified queries first.

    The verification driver evaluates queries in insertion order with a
    fixed budget (50 of the declared set per round), so insertion order IS
    the sampling policy. Four tiers, each interleaved one-query-per-module
    round-robin so any prefix spans relational/functions/datapipe/streaming/
    DDL/sources/qtest:

      0. sampled before and FAILED (regression — must be re-seen to show
         the fix); a ``no_oracle`` row only lands here if the query has
         since gained a declared oracle (i.e. the fix needs re-sampling);
      1. never sampled by any round (the coverage debt);
      2. green in their latest sampled round (cheapest to lose a slot);
      3. permanent rows-only queries (``no_oracle`` by design, still no
         declared oracle) — they can never turn green, so they must not
         pre-spend sample slots every round.

    The tiers come from the committed CORRECTNESS_r*.json files, so the
    ordering self-adapts each round without hand-editing.
    """
    from . import (
        datapipe_q, ddl_q, functions_q, qtest_q, relational, sources_q,
        streaming_q)

    mods = (relational, functions_q, datapipe_q, streaming_q, ddl_q,
            sources_q, qtest_q)

    status = _latest_driver_status()

    all_oracle: dict[str, str] = {}
    # per-module ordered key lists, split by tier (declared order preserved
    # within a module+tier: most representative queries first)
    per_mod: list[tuple[dict[str, QueryFn], dict[str, str]]] = []
    seen: set[str] = set()
    for mod in mods:
        for k in mod.QUERIES:
            if k in seen:
                raise ValueError(f"duplicate query key {k!r}")
            seen.add(k)
        all_oracle.update(mod.ORACLE)
        per_mod.append((mod.QUERIES, mod.ORACLE))

    def tier(key: str) -> int:
        if key not in status:
            return 1
        green, err = status[key]
        if green:
            return 2
        if err == "no_oracle" and key not in all_oracle:
            return 3  # rows-only by design — can never turn green
        return 0

    queries: dict[str, QueryFn] = {}
    oracle: dict[str, str] = {}
    rot = _next_round_no()
    for t in (0, 1, 2, 3):
        mod_lists = [[(k, fn) for k, fn in q.items() if tier(k) == t]
                     for q, _ in per_mod]
        if t == 2 and rot:
            # green-rotation: with ~200 declared keys and a 50-slot driver
            # window, a long-green query after the window would NEVER be
            # re-sampled — a silent-regression blind spot (the r6
            # insert_into failures were caught only because those keys had
            # never been sampled). Rotating each module's green list by
            # the round number cycles every green key through the window
            # every ~len/visible rounds; tiers 0/1 stay strictly ahead,
            # so no regression or coverage slot is ever lost.
            mod_lists = [
                lst[rot % len(lst):] + lst[:rot % len(lst)] if lst else lst
                for lst in mod_lists]
        iters = [iter(lst) for lst in mod_lists]
        by_mod_oracle = [orc for _, orc in per_mod]
        while iters:
            nxt = []
            for it, orc in zip(iters, by_mod_oracle):
                try:
                    k, fn = next(it)
                except StopIteration:
                    continue
                queries[k] = fn
                if k in orc:
                    oracle[k] = orc[k]
                nxt.append((it, orc))
            if not nxt:
                break
            iters = [it for it, _ in nxt]
            by_mod_oracle = [orc for _, orc in nxt]

    missing = set(all_oracle) - set(queries)
    if missing:
        raise ValueError(f"oracle without query: {missing}")
    return queries, oracle
