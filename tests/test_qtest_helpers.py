"""Pure-Python unit tests for the qfile runner's parsing helpers (no
SparkSession — these cover the corner cases the 810-file sweep exercises
end-to-end)."""

from __future__ import annotations

from hive_nexr_spark.functions.hive_compat import _py_hive_hash
from hive_nexr_spark.sources.qtest import (
    _rewrite_ngrams_stmt,
    _split_args,
    _split_statements,
)


def test_split_respects_quoted_semicolons():
    # query_with_semi.q shape
    stmts = [s.strip() for s in _split_statements(
        "select 'a;b' from t; select 1;") if s.strip()]
    assert stmts == ["select 'a;b' from t", "select 1"]


def test_split_consumes_inline_comment_with_apostrophe():
    # sample5.q: "-- here's another test" must not flip the quote state
    stmts = [s.strip() for s in _split_statements(
        "select * -- here's a note\nfrom t; select 2;") if s.strip()]
    assert stmts[0].startswith("select *")
    assert "here's" not in stmts[0]
    assert stmts[1] == "select 2"


def test_split_backtick_identifiers():
    stmts = [s.strip() for s in _split_statements(
        "show table extended like `x`; select 1;") if s.strip()]
    assert stmts == ["show table extended like `x`", "select 1"]


def test_split_args_top_level_only():
    assert _split_args("sentences(lower(c)), 1, 100, 1000") == [
        "sentences(lower(c))", "1", "100", "1000"]
    assert _split_args("array('a', null), 2") == ["array('a', null)", "2"]


def test_hive_hash_multi_arg_combine():
    # GenericUDFHash: r = r*31 + h(arg); golden-anchored via
    # auto_join1.q.out in the declared-query oracle
    assert _py_hive_hash(0, "") == 0
    assert _py_hive_hash(1, 2) == 31 * 1 + 2
    assert _py_hive_hash(None) == 0
    assert _py_hive_hash(True) == 1
    assert _py_hive_hash(False) == 0


def test_ngrams_rewrite_shapes():
    out = _rewrite_ngrams_stmt(
        "SELECT ngrams(sentences(lower(contents)), 2, 100, 1000)"
        ".estfrequency FROM kafka")
    assert out.startswith("SELECT collect_list(f) AS estfrequency")
    assert "slice(sent, i + 1, 2)" in out
    out2 = _rewrite_ngrams_stmt(
        "SELECT context_ngrams(sentences(lower(c)), array(\"he\",null), "
        "100, 1000) FROM kafka")
    assert "element_at(win, 1) = 'he'" in out2
    assert "struct(gram AS ngram, f AS estfrequency)" in out2
    # non-matching statements pass through untouched
    passthrough = "SELECT ngrams FROM t WHERE x = 1"
    assert _rewrite_ngrams_stmt(passthrough) == passthrough
