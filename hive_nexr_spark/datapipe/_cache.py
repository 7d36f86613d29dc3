"""Bounded persist tracking for shared intermediate stages.

LSH-style operators persist an expensive shared stage (shingle arrays, band
buckets) that is consumed several times within one query. A bare
``.persist()`` with no release accumulates MEMORY_AND_DISK blocks across a
multi-query sweep (driver correctness run, bench loop) — the cache from
query N is dead weight while query N+1 runs.

``tracked_persist`` keeps at most the persists of the CURRENT operator
alive: constructing the next persisting operator releases the previous
ones. Unpersisting never invalidates a DataFrame (it only drops the cache),
so a still-pending earlier query stays correct — it just recomputes.

CONCURRENCY CONTRACT (deliberate): the tracker is a module global shared
across threads, sized for the SEQUENTIAL driver/bench/sweep loops this
repo runs. Two operators built concurrently would thrash each other's
caches — never a wrong result (unpersist only drops blocks), just lost
caching. If a concurrent harness ever matters, key ``_LIVE`` by query tag
(e.g. spark.sparkContext.setJobGroup id) instead of one shared list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_LIVE: list[DataFrame] = []


def tracked_persist(df: DataFrame) -> DataFrame:
    """Persist ``df`` after releasing persists from prior tracked calls."""
    release_tracked()
    df = df.persist()
    _LIVE.append(df)
    return df


def release_tracked() -> None:
    """Release every live tracked persist NOW (r14). The bench/sweep
    loops call this BETWEEN keys: `tracked_persist_extend` blocks
    otherwise survive into the next key, and Spark's CacheManager
    substitutes them into any later query whose canonicalized subtree
    matches — measured r14: bpe_train_merges runs 871 tasks in a fresh
    process but 223 mid-sweep (the r13 'unattributed task drops' were
    exactly this cross-key cache bleed, VERDICT item 5). Releasing
    between keys keeps per-key bench numbers independent. Unpersist
    never invalidates a DataFrame — later reuse just recomputes."""
    for old in _LIVE:
        try:
            old.unpersist()
        except Exception:
            pass  # session gone / already released — nothing to leak
    _LIVE.clear()


def tracked_persist_extend(df: DataFrame) -> DataFrame:
    """Persist WITHOUT releasing this operator's earlier tracked persists.

    For iterative chains (BPE merge loop) where level k+1's plan references
    level k twice (directly, and through the per-level argmax): persisting
    EVERY level keeps the lazy DAG linear — the first reference
    materializes the cache, the second reads it — where unpersisting level
    k before k+1 materializes would re-expand the chain exponentially.
    All levels are released together when the NEXT operator calls
    ``tracked_persist``."""
    df = df.persist()
    _LIVE.append(df)
    return df
