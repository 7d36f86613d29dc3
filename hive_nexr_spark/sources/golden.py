"""Golden-output parity: parse the reference's own `.q.out` expected
files and diff this engine's SELECT results against them.

The reference pins every clientpositive test to a golden transcript
(`ql/src/test/results/clientpositive/<name>.q.out`) written by its CLI
harness (`ql/src/test/templates/TestCliDriver.vm` drives `QTestUtil`,
which diffs the CLI output against the golden file). Each executed
statement appears as a PREHOOK/POSTHOOK metadata block; for result
statements the data rows follow the block, tab-separated, one line per
row — exactly Hive's LazySimpleSerDe text rendering (NULL for null,
Java `Double.toString` for doubles, JSON-ish for complex types).

This module re-uses those transcripts directly as an oracle: it parses
a `.q.out` into ordered (query, rows) entries, selects the entries that
are plain result queries (SELECT / FROM-first SELECT without INSERT —
the same classification `run_qfile` uses for its capture hook), and
compares our DataFrame rows against the golden rows as order-insensitive
multisets with numeric canonicalization (Java and Python render the
same double differently; values must agree, formatting need not).

Non-goals, by design: EXPLAIN transcripts (the reference pins its own
MapReduce plan text — this engine's plans are Catalyst's), DESCRIBE/SHOW
formatting (metadata surface differs), and dfs/shell escape output.
Files whose observable SELECT results disagree — or whose statements we
rewrite into a different result shape — simply don't count as matched;
the sweep (`tools/golden_diff.py`) reports the per-class histogram.
"""

from __future__ import annotations

import json
import math
import re

# Documented STALE-TRANSCRIPT tolerances: cases where the reference's own
# 2010 `.q.out` diverges from what the reference's CODE computes (both
# code-traced in past rounds), so the transcript — not the engine — is
# wrong. Each entry pins the EXACT canonical-row symmetric difference for
# ONE select index; any other divergence in these files still fails.
#   escape1.q: the golden lost the '^' partition row (127 rows vs the 13
#     planted single-char partitions x ~10 rows = 128 the DDL creates;
#     our extra ('1','1','^') row IS that partition) and renders the
#     literal-tab row as 4 tab-split fields ('1','1','','') vs our
#     3-field row ('1','1','\t') — same CLI line bytes.
# (Round-9 note: udf_get_json_object.q was WRONGLY listed here in r8 — the
# advisor's re-trace showed UDFJson.extract_json_withindex reassigns
# jsonList INSIDE the numeric-index loop, so '$.store.basket[*][0]' really
# does evaluate to scalar '1' as the transcript pins. The engine now
# emulates that quirk bit-for-bit (functions/hive_compat.py
# _py_hive_get_json_object + the qtest bug-pattern rewrite) and the
# tolerance is gone.)
STALE_TRANSCRIPT_TOLERANCES: dict[str, list[dict]] = {
    "escape1.q.out": [{
        "index": 1,
        "extra_ours": [("1", "1", "\t"), ("1", "1", "^")],
        "extra_theirs": [("1", "1", "", "")],
    }],
}


def _stale_tolerated(tol_specs: list[dict], index: int, df_rows,
                     golden_lines: list[str],
                     float_cols: set[int] | None) -> bool:
    """True iff the observed canonical diff at `index` equals a pinned
    stale-transcript tolerance — exact match only, nothing broader."""
    from collections import Counter

    specs = [t for t in tol_specs if t["index"] == index]
    if not specs:
        return False
    ours = Counter(canon_df_row(r, float_cols) for r in df_rows)
    theirs = Counter(canon_golden_row(ln, float_cols)
                     for ln in golden_lines)
    extra_ours, extra_theirs = ours - theirs, theirs - ours
    for t in specs:
        if "extra_ours" in t:
            if (extra_ours == Counter(t["extra_ours"])
                    and extra_theirs == Counter(t["extra_theirs"])):
                return True
        if "cell_diffs" in t:
            if sum(extra_ours.values()) != 1 or sum(
                    extra_theirs.values()) != 1:
                continue
            (our_row,) = extra_ours
            (their_row,) = extra_theirs
            if len(our_row) != len(their_row):
                continue
            diffs = [(i, g, o) for i, (o, g) in
                     enumerate(zip(our_row, their_row)) if o != g]
            if diffs == t["cell_diffs"]:
                return True
    return False


def parse_qout(path: str) -> list[tuple[str, list[str]]]:
    """Parse a golden `.q.out` into ordered (query_text, result_rows).

    Grammar (QTestUtil transcript): a statement opens with
    ``PREHOOK: query: <text...>`` (text runs until ``PREHOOK: type:``),
    followed by PREHOOK/POSTHOOK metadata lines (Input/Output/Lineage/
    type/query mirrors); every subsequent line up to the next
    ``PREHOOK: query:`` is a result row of that statement.
    """
    entries: list[tuple[str, list[str]]] = []
    query_lines: list[str] = []
    rows: list[str] = []
    state = None  # None | "query" | "postquery" | "rows"
    has_pre = False  # current entry opened by a PREHOOK line
    mirror_seen = False  # current entry's POSTHOOK mirror already passed
    with open(path, errors="replace") as fh:
        for raw in fh:
            line = raw.rstrip("\n")
            opener = None
            if line.startswith("PREHOOK: query:"):
                opener = "PREHOOK: query:"
            elif line.startswith("POSTHOOK: query:") and (
                    state is None
                    or (state == "rows"
                        and (rows or not has_pre or mirror_seen))):
                # with a custom pre-hook (no_hooks.q, hook_context_cs.q)
                # the PREHOOK printer is off — a POSTHOOK line that
                # cannot be the current entry's mirror (data already
                # seen, no PREHOOK opened it, or the mirror has already
                # passed) OPENS a statement
                opener = "POSTHOOK: query:"
            if opener:
                if state is not None:
                    entries.append((" ".join(query_lines), rows))
                first = line[len(opener):].strip()
                query_lines = [] if first.startswith("--") else [first]
                rows = []
                state = "query"
                has_pre = opener.startswith("PREHOOK")
                mirror_seen = False
            elif state == "query":
                # query text runs until the PREHOOK: type: line; `--`
                # comment lines inside it (qfiles often open a statement
                # with a comment) are not SQL — drop them so the joined
                # text starts with the real verb
                if line.startswith(("PREHOOK:", "POSTHOOK:")):
                    state = "rows"
                elif not line.strip().startswith("--"):
                    query_lines.append(line.strip())
            elif state == "postquery":
                # the POSTHOOK: query: mirror repeats the (possibly
                # multi-line) text — consume it, it is not result data
                if line.startswith(("PREHOOK:", "POSTHOOK:")):
                    state = "rows"
                else:
                    continue
            elif state == "rows":
                if line.startswith("POSTHOOK: query:"):
                    state = "postquery"
                    mirror_seen = True
                elif line.startswith(("PREHOOK:", "POSTHOOK:")):
                    continue  # metadata (Input/Output/Lineage/type)
                else:
                    rows.append(line)
    if state is not None:
        entries.append((" ".join(query_lines), rows))
    qfile = path.replace("/results/", "/queries/")
    qfile = qfile[:-4] if qfile.endswith(".out") else ""
    try:
        with open(qfile, errors="replace") as fh:
            has_cat = "dfs -cat" in fh.read()
    except OSError:
        has_cat = True  # unknown corpus layout — keep prior behavior
    return _split_dfs_cat(entries, has_cat)


def _split_dfs_cat(entries: list[tuple[str, list[str]]],
                   has_cat: bool = True
                   ) -> list[tuple[str, list[str]]]:
    """`dfs -cat <dir>/*` output has NO transcript block of its own — the
    CLI prints the file contents directly, so the lines glue onto the
    PREVIOUS statement's result block (input13.q: dest3's rows + the
    dest4.out directory dump) or onto the IOD statement itself (subq.q).
    Split them back out as synthetic ("dfs -cat", rows) entries, keyed on
    the arity drop to the 1-field raw lines. Only applies to files that
    actually INSERT OVERWRITE DIRECTORY."""
    if not has_cat or not any(
            "overwrite" in q.lower() and "directory" in q.lower()
            for q, _ in entries):
        # without a `dfs -cat` in the source qfile, rows inside an IOD
        # block are the harness's own echo (multi_insert.q's local-dir
        # arms), not directory dumps to pair with captured frames
        return entries
    out: list[tuple[str, list[str]]] = []
    for q, rows in entries:
        ql = " ".join(q.split()).lower()
        if ("overwrite directory" in ql or "overwrite local directory"
                in ql) and rows and not is_result_query(q) \
                and not ql.startswith("explain"):
            out.append((q, []))
            out.append(("dfs -cat", rows))
            continue
        if is_result_query(q) and rows:
            arities = [len(r.split("\t")) for r in rows]
            if arities[0] > 1:
                k = len(rows)
                while k > 0 and arities[k - 1] == 1:
                    k -= 1
                if 0 < k < len(rows) and all(
                        a == arities[0] for a in arities[:k]):
                    out.append((q, rows[:k]))
                    out.append(("dfs -cat", rows[k:]))
                    continue
        out.append((q, rows))
    return out


def is_result_query(query_text: str) -> bool:
    """The golden-side twin of run_qfile's capture rule: plain SELECTs
    and Hive's FROM-first form with no INSERT target produce result rows
    on the CLI; everything else (DDL, INSERT, EXPLAIN, LOAD, SHOW,
    DESCRIBE) either prints nothing or prints a non-data transcript."""
    q = " ".join(query_text.split()).lower()
    if q.startswith("select"):
        return True
    if q.startswith("dfs -cat"):
        # synthetic entry from _split_dfs_cat: raw directory-dump lines
        return True
    if q.startswith("show locks"):
        # the lock manager is real (lockmgr.py): SHOW LOCKS prints lock
        # rows the goldens record (lock1-4.q)
        return True
    return q.startswith("from") and " insert " not in f" {q} "


def golden_selects(entries: list[tuple[str, list[str]]]) -> list[
        tuple[str, list[str]]]:
    return [(q, rows) for q, rows in entries if is_result_query(q)]


# ---------------------------------------------------------------------------
# row canonicalization


def _canon_field(s: str) -> str:
    """Canonicalize one tab-separated golden field: numbers to a
    format-independent form (Java prints 200.0 where Python may print
    200, 1.0E8 vs 1e+08), everything else verbatim."""
    if s == "NULL":
        return "NULL"
    ts = re.fullmatch(
        r"(\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2})\.(\d+)", s)
    if ts:
        # Hive renders timestamps with NANOsecond fractions; this engine
        # (Spark) carries microseconds — truncate to 6 digits and strip
        # trailing zeros so equal instants render identically
        frac = ts.group(2)[:6].rstrip("0")
        return ts.group(1) + (f".{frac}" if frac else "")
    if s.startswith("LOCK_QUERYID:"):
        # SHOW LOCKS extended detail line: the query id embeds the
        # generating user/timestamp/uuid and LOCK_TIME the acquisition
        # epoch — both run-dependent; the stable content is the mode
        return re.sub(r"LOCK_QUERYID:\S+ LOCK_TIME:\d+",
                      "LOCK_QUERYID:<id> LOCK_TIME:<t>", s)
    if re.match(r"^(pfile|file|hdfs|s3[an]?):/", s):
        # filesystem URIs embed the generating host's absolute paths
        # (the index goldens carry pfile:/data/users/<user>/... from the
        # 2011 run) — compare by final path segment only
        return s.rstrip("/").rsplit("/", 1)[-1]
    arr = re.fullmatch(r"\[([-\d.eE+, ]*)\]", s)
    if arr is not None:
        # a numeric array compares order-insensitively: Hive's collect
        # order inside e.g. the compact index `_offsets` payload is MR
        # shuffle order, ours is sort_array — sort both sides
        elems = [e.strip() for e in arr.group(1).split(",") if e.strip()]
        try:
            elems.sort(key=float)
        except ValueError:
            pass
        return "[" + ",".join(_canon_field(e) for e in elems) + "]"
    if s[:1] in "{[":
        # JSON-ish complex rendering (SerDeUtils buildJSONString): map
        # entry order is Java HashMap iteration order (str_to_map.q
        # golden prints {"b":2,"c":3,"a":1}), and map_keys/map_values
        # array order follows it — both are semantically unordered, so
        # canon sorts object keys AND array elements on BOTH sides
        # (the DataFrame cell path routes through this same function).
        # Genuine ordered-array cells (collect_list over sorted input)
        # lose order sensitivity here; the golden corpus has no case
        # where element order is the only difference checked.
        try:
            return _canon_json(json.loads(s))
        except ValueError:
            pass
    if s == "null":
        # Hive prints a NULL complex value as JSON null (SerDeUtils
        # buildJSONString) but an atomic NULL as NULL; fold both (the
        # cell side folds a literal "null" string identically, so the
        # mapping stays symmetric)
        return "NULL"
    if "_" in s:
        return s  # Python float() reads '000000_0' as 0 — not a number
    try:
        v = float(s)
    except ValueError:
        return s
    if math.isnan(v):
        return "NaN"
    if math.isinf(v):
        return "Inf" if v > 0 else "-Inf"
    if v == int(v) and abs(v) < 1e15:
        return str(int(v))
    return format(v, ".10g")


def _canon_json(v) -> str:
    """Canonical rendering of a parsed JSON value: object keys sorted,
    array elements sorted by their canonical form, numbers through the
    same float canon as scalar fields."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (int, float)):
        return _canon_field(repr(v))
    if isinstance(v, str):
        return json.dumps(_canon_field(v), ensure_ascii=False)
    if isinstance(v, dict):
        return "{" + ",".join(
            f"{json.dumps(str(k), ensure_ascii=False)}:{_canon_json(x)}"
            for k, x in sorted(v.items(), key=lambda kv: str(kv[0]))) + "}"
    if isinstance(v, list):
        return "[" + ",".join(sorted(_canon_json(x) for x in v)) + "]"
    return str(v)


def _canon_cell(v) -> str:
    """Render one DataFrame cell the way the golden file would, then
    canonicalize numerics identically to `_canon_field`."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if math.isinf(v):
            return "Inf" if v > 0 else "-Inf"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return format(v, ".10g")
    if isinstance(v, (int,)):
        # past exact-double-display range, fold to the float canon: a
        # Hive-0.8 type quirk widens bigint through double in several
        # goldens (udf_abs, type_widening print 9.223372037e+18) — the
        # golden FIELD side lands there via float(), so the cell side
        # must too or equal values render differently
        if abs(v) >= 1e15:
            return format(float(v), ".10g")
        return str(v)
    if isinstance(v, bytes):
        return v.decode("utf-8", errors="replace")
    if isinstance(v, (list, tuple, dict)) or hasattr(v, "asDict"):
        return _canon_field(_render_complex(v))
    return _canon_field(str(v))


def _render_complex(v) -> str:
    """Hive's CLI JSON-ish rendering of complex values
    (`serde2/SerDeUtils.java` buildJSONString): struct `{"name":v,...}`,
    array `[...]`, map `{key:v,...}` (keys bare when numeric), null as
    `null`, and the runner's uniontype struct encoding
    (tag, field0..fieldN) printed back as Hive prints a union:
    `{<tag>:<selected member>}`. Map entries compare key-sorted — the
    parquet round-trip does not preserve Hive's insertion order."""
    import datetime
    import decimal

    if v is None:
        return "null"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (int,)):
        return str(v)
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return format(v, ".1f")  # json/Hive render 2.0, not 2
        return repr(v)
    if isinstance(v, (bytes, bytearray)):
        v = v.decode("utf-8", errors="replace")
    if isinstance(v, (datetime.date, datetime.datetime)):
        v = str(v)
    if isinstance(v, str):
        return json.dumps(v, ensure_ascii=False)
    if hasattr(v, "asDict"):
        d = v.asDict()
        names = list(d)
        if names and names[0] == "tag" and all(
                n == f"field{i}" for i, n in enumerate(names[1:])):
            tag = d["tag"]
            sel = d.get(f"field{tag}") if tag is not None else None
            return "{%s:%s}" % (tag, _render_complex(sel))
        return ("{" + ",".join(
            f"{json.dumps(k, ensure_ascii=False)}:{_render_complex(x)}"
            for k, x in d.items()) + "}")
    if isinstance(v, dict):
        def key(k) -> str:
            return (str(k) if isinstance(k, (int, float))
                    else json.dumps(str(k), ensure_ascii=False))

        return ("{" + ",".join(
            f"{key(k)}:{_render_complex(x)}"
            for k, x in sorted(v.items(), key=lambda kv: str(kv[0])))
            + "}")
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_render_complex(x) for x in v) + "]"
    return str(v)


def _snap_f32(s: str) -> str:
    """Round a decimal rendering to FLOAT32 precision before the normal
    float canon. Java's Float.toString and Python's repr print the SAME
    float32 value with different digit counts (1.29387251E9 vs
    1293872512.0); snapping both sides to the value's float32 bits first
    makes the canon digit-exact for equal values."""
    import struct as _struct

    try:
        v = float(s)
    except ValueError:
        return s
    if math.isnan(v) or math.isinf(v):
        return _canon_field(s)
    snapped = _struct.unpack(">f", _struct.pack(">f", v))[0]
    return _canon_field(repr(snapped))


def canon_golden_row(line: str,
                     float_cols: set[int] | None = None) -> tuple[str, ...]:
    fields = line.split("\t")
    return tuple(
        _snap_f32(f) if float_cols and i in float_cols and f != "NULL"
        else _canon_field(f)
        for i, f in enumerate(fields))


def canon_df_row(row, float_cols: set[int] | None = None) -> tuple[str, ...]:
    return tuple(
        _snap_f32(repr(v)) if float_cols and i in float_cols
        and isinstance(v, float) else _canon_cell(v)
        for i, v in enumerate(row))


def float_col_indexes(df) -> set[int]:
    """Positions of FLOAT (32-bit) columns — the ones whose golden
    rendering needs the float32 snap."""
    return {i for i, (_, t) in enumerate(df.dtypes) if t == "float"}


def rows_equal(df_rows, golden_lines: list[str],
               float_cols: set[int] | None = None) -> bool:
    """Order-insensitive multiset equality between a collected DataFrame
    and a golden result block (golden SELECT order is the reference's
    MapReduce emission order — not a semantic guarantee). When a STRING
    value contains a literal tab, the golden line is ambiguous (the CLI
    prints columns tab-separated) — fall back to whole-line equality of
    the tab-joined render, which is exactly what the reference's own
    golden diff compares."""
    ours = sorted(canon_df_row(r, float_cols) for r in df_rows)
    theirs = sorted(canon_golden_row(ln, float_cols)
                    for ln in golden_lines)
    if ours == theirs:
        return True
    our_lines = sorted("\t".join(_canon_cell(v) for v in r)
                       for r in df_rows)
    their_lines = sorted(
        "\t".join(_canon_field(f) for f in ln.split("\t"))
        for ln in golden_lines)
    if our_lines == their_lines:
        return True
    # a string value containing literal NEWLINES prints as multiple CLI
    # display lines, which the golden records as separate "rows"
    # (query_result_fileformat.q; the MR path additionally re-parses
    # them as rows with NULL-padded trailing columns) — compare in
    # display-line space with trailing NULL padding stripped
    if not any(isinstance(v, str) and "\n" in v
               for r in df_rows for v in r):
        return False

    def strip_pad(line: str) -> str:
        return re.sub(r"(\tNULL)+$", "", line)

    our_display = sorted(
        strip_pad("\t".join(_canon_field(p) for p in dl.split("\t")))
        for r in df_rows
        for dl in "\t".join("NULL" if v is None else str(v)
                            for v in r).split("\n"))
    their_display = sorted(
        strip_pad("\t".join(_canon_field(f) for f in ln.split("\t")))
        for ln in golden_lines)
    return our_display == their_display


def diff_file(captured, golden_path: str) -> dict:
    """Compare run_qfile's captured SELECT results against the golden.

    `captured` is the list `run_qfile(spark, qf, capture=...)` filled:
    one materialized DataFrame per result statement, in execution order.
    Returns a dict with `status` in {match, value_mismatch,
    select_count_mismatch, no_selects} plus detail for the sweep."""
    sel = golden_selects(parse_qout(golden_path))
    qfile_path = golden_path.replace("/results/", "/queries/")
    qfile_path = qfile_path[:-4] if qfile_path.endswith(".out") else ""
    try:
        import re as _re

        with open(qfile_path, errors="replace") as fh:
            has_bare_set = bool(_re.search(r"(?mi)^\s*set\s+[\w.:]+\s*;",
                                           fh.read()))
    except OSError:
        has_bare_set = False
    if has_bare_set:
        # a bare `set key;` prints `key=value` with NO transcript block
        # (set_processor_namespaces.q) — the echo line glues onto the
        # previous result block; drop such lines from the golden side
        sel = [(q, [r for r in rows
                    if not _re.fullmatch(r"[\w.:]+=[^\t]*", r)])
               for q, rows in sel]
    # `dfs -rmr` prints "Deleted <path>" with no transcript block either
    # (patterned_partition.q) — same gluing, same treatment
    sel = [(q, [r for r in rows
                if not r.startswith(("Deleted file:", "Deleted hdfs:",
                                     "Deleted pfile:"))])
           for q, rows in sel]
    if not sel and not captured:
        return {"status": "no_selects", "selects": 0}
    if len(captured) > len(sel):
        # a SELECT with BOTH CLI printers hook-disabled AND an empty
        # result leaves no trace in the golden at all
        # (hook_context_cs.q's second select) — drop trailing empty
        # frames to realign
        captured = list(captured)
        while len(captured) > len(sel) and any(
                not df.take(1) for df in captured):
            for i in range(len(captured) - 1, -1, -1):
                if not captured[i].take(1):
                    del captured[i]
                    break
    if len(sel) != len(captured):
        return {"status": "select_count_mismatch",
                "golden_selects": len(sel), "captured": len(captured)}
    import os as _os

    tol = STALE_TRANSCRIPT_TOLERANCES.get(_os.path.basename(golden_path))
    mismatches = []
    tolerated = 0
    for i, ((q, rows), df) in enumerate(zip(sel, captured)):
        df_rows = df.collect()
        fc = float_col_indexes(df)
        if not rows_equal(df_rows, rows, fc):
            if tol and _stale_tolerated(tol, i, df_rows, rows, fc):
                tolerated += 1
                continue
            mismatches.append({"index": i, "query": q[:120],
                               "golden_rows": len(rows),
                               "our_rows": len(df_rows)})
    if mismatches:
        return {"status": "value_mismatch", "selects": len(sel),
                "mismatched": mismatches[:3],
                "n_mismatched": len(mismatches)}
    out = {"status": "match", "selects": len(sel)}
    if tolerated:
        out["stale_transcript_tolerated"] = tolerated
    return out
