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


def test_java_random_doubles_matches_jdk():
    """First nextDouble() values of java.util.Random for known seeds
    (JDK-documented LCG; seed 3's first double is the udf4.q golden)."""
    from hive_nexr_spark.sources.qtest import _java_random_doubles

    v3 = _java_random_doubles(3, 2)
    assert abs(v3[0] - 0.731057369148862) < 1e-15
    # sequence continues deterministically and stays in [0, 1)
    v = _java_random_doubles(1, 1000)
    assert all(0.0 <= x < 1.0 for x in v)
    assert len(set(v)) == 1000


def test_hive_struct_names_rewrite():
    from hive_nexr_spark.sources.qtest import _hive_struct_names

    out = _hive_struct_names(
        "SELECT max(struct(CAST(key as INT), value)) FROM src")
    assert ("named_struct('col1', CAST(key as INT), 'col2', value)"
            in out)
    # named_struct untouched; nested parens balanced
    s2 = "SELECT named_struct('a', 1), struct(f(x, y), z) FROM t"
    out2 = _hive_struct_names(s2)
    assert "named_struct('a', 1)" in out2
    assert "named_struct('col1', f(x, y), 'col2', z)" in out2


def test_canon_timestamp_fraction_truncation():
    from hive_nexr_spark.sources.golden import _canon_field

    # Hive nanos vs Spark micros: equal instants canon identically
    assert (_canon_field("2011-05-06 02:08:09.2464567")
            == _canon_field("2011-05-06 02:08:09.246456"))
    assert (_canon_field("2011-01-01 01:01:01.001000011")
            == _canon_field("2011-01-01 01:01:01.001"))
    # non-timestamp strings untouched
    assert _canon_field("val_123") == "val_123"


def test_split_dfs_cat_entries():
    from hive_nexr_spark.sources.golden import parse_qout  # noqa: F401
    from hive_nexr_spark.sources.golden import (_split_dfs_cat,
                                                golden_selects)

    entries = [
        ("FROM src INSERT OVERWRITE DIRECTORY '/tmp/x' SELECT src.value",
         ["v1", "v2"]),
        ("SELECT dest3.* FROM dest3",
         ["1\ta\tb", "2\tc\td", "line1", "line2"]),
    ]
    out = _split_dfs_cat(entries)
    sel = golden_selects(out)
    # IOD rows and the glued display lines become synthetic cat entries
    assert ("dfs -cat", ["v1", "v2"]) in out
    assert ("dfs -cat", ["line1", "line2"]) in out
    assert ("SELECT dest3.* FROM dest3", ["1\ta\tb", "2\tc\td"]) in out
    assert len(sel) == 3  # 2 cat entries + the select


def test_canon_json_sorts_maps_and_arrays():
    from hive_nexr_spark.sources.golden import _canon_field

    assert (_canon_field('{"b":"2","c":"3","a":"1"}')
            == _canon_field('{"a":"1","b":"2","c":"3"}'))
    assert _canon_field('["b","a","c"]') == _canon_field('["a","b","c"]')


def test_unescape_sql_string_line_delims():
    """`parse/BaseSemanticAnalyzer.java` unescapeSQLString semantics:
    '\\012' (octal) IS newline (ctas.q:46,51), '10' stays literal and is
    accepted by the line-delim check (input_lazyserde.q), '\\t' and ','
    are rejected (line_terminator.q)."""
    from hive_nexr_spark.sources.qtest import _unescape_sql_string

    assert _unescape_sql_string("\\012") == "\n"
    assert _unescape_sql_string("\\n") == "\n"
    assert _unescape_sql_string("10") == "10"
    assert _unescape_sql_string("\\t") == "\t"
    assert _unescape_sql_string(",") == ","
    assert _unescape_sql_string("\\001") == "\x01"
    assert _unescape_sql_string("a\\'b") == "a'b"
    ok = {"\n", "10"}
    assert _unescape_sql_string("\\012") in ok
    assert _unescape_sql_string("10") in ok
    assert _unescape_sql_string("\\t") not in ok
    assert _unescape_sql_string(",") not in ok
