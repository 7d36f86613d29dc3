"""bench.py output-framing contract.

Round-8 regression: embedding the per-query `metrics` fingerprint dict in
the single stdout summary line pushed it to ~9,280 chars; the driver keeps
only a 2,000-char tail of stdout, so BENCH_r08.json recorded parsed:null
and round 8 lost its authoritative wall-time record. The fix keeps the
FINAL stdout line the compact summary (metric/value/unit/queries/sf) and
emits the fingerprints on an earlier line + the BENCH_METRICS.json sidecar.
These tests pin that framing as the HEADLINE set grows.
"""

from __future__ import annotations

import json

import bench


def _final_line_for(headline: list[str]) -> str:
    # Worst-case realistic rendering: every query at a 4-digit wall time
    # with 3 decimals (9 chars per value — wider than anything observed).
    payload = {
        "metric": "headline_queries_total_wall",
        "value": 99999.999,
        "unit": "sec",
        "queries": {name: 9999.999 for name in headline},
        "sf": 0.1,
    }
    return json.dumps(payload)


def test_final_line_fits_driver_tail():
    """The driver parses the last line from a 2,000-char stdout tail; keep
    headroom (<1,800) so a few more headline queries never break parsing."""
    line = _final_line_for(bench.HEADLINE)
    assert len(line) < 1800, (
        f"final bench line is {len(line)} chars with {len(bench.HEADLINE)} "
        "headline queries — trim HEADLINE or move data to the metrics line"
    )


def test_headline_names_unique_and_known():
    assert len(bench.HEADLINE) == len(set(bench.HEADLINE))
    import __spark_entry__ as entry_mod

    missing = [n for n in bench.HEADLINE if n not in entry_mod.queries()]
    assert not missing, missing


def test_metrics_not_in_final_payload_source():
    """The LAST json.dumps in main() (the line the driver parses) must not
    carry the metrics dict — the exact round-8 regression. Pinned against
    the real source, not a reconstruction."""
    import inspect

    src = inspect.getsource(bench.main)
    final_dump = src[src.rindex("json.dumps"):]
    assert '"metrics"' not in final_dump and "metrics_payload" not in final_dump
    # and the metrics line/sidecar must still exist earlier in main()
    assert "BENCH_METRICS.json" in src
    assert src.index("metrics_payload") < src.rindex("json.dumps")
