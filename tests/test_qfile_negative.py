"""Negative-corpus parity (SURVEY §5 item 2): the reference asserts that
`clientnegative/*.q` files FAIL. A hand-picked must-raise set runs through
the same runner as the positive corpus — each must surface an error, not
silently succeed. (The full 285-file histogram incl. the documented
tolerated class comes from tools/qfile_negative_sweep.py.)"""

from __future__ import annotations

import pytest

NEG_DIR = "/root/reference/ql/src/test/queries/clientnegative"

# error classes the engine must genuinely reject (no dialect tolerance
# applies): unresolved/ambiguous columns, parse errors, bad aggregate
# syntax, unknown UDF classes
MUST_RAISE = [
    "ambiguous_col.q",          # self-conflicting subquery alias
    "invalid_create_tbl2.q",    # plain syntax garbage
    "invalid_select_expression.q",
    "invalid_avg_syntax.q",     # avg(*)
    "create_unknown_genericudf.q",  # unloadable function class
    # IMPORT into an existing table with an incompatible schema
    # (`ImportSemanticAnalyzer.checkTable`; round-5 compat check)
    "exim_03_nonpart_noncompat_colschema.q",
    "exim_05_nonpart_noncompat_coltype.q",
    # round-6 real-semantics classes (one representative each)
    "lockneg1.q",               # EXCLUSIVE over held SHARED lock
    "protectmode_tbl_no_drop.q",  # NO_DROP blocks DROP TABLE
    "touch2.q",                 # TOUCH spec on unpartitioned table
    "duplicate_insert1.q",      # same multi-insert output twice
    "merge_negative_2.q",       # CONCATENATE needs a partition desc
    "create_view_failure7.q",   # all view outputs partitioned
    "drop_view_failure1.q",     # DROP VIEW on a base table
    "fs_default_name1.q",       # malformed fs.default.name
    "regex_col_1.q",            # uncompilable regex column ref
    "line_terminator.q",        # LINES TERMINATED BY ',' (non-newline)
]


@pytest.mark.parametrize("qf", MUST_RAISE)
def test_negative_file_raises(spark, qf):
    from hive_nexr_spark.sources.qtest import run_qfile

    with pytest.raises(Exception):
        df = run_qfile(spark, f"{NEG_DIR}/{qf}")
        df.take(5)  # force execution for lazily-failing plans
