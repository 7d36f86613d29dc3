"""Hive-0.8 statement-level semantic validations for error parity.

The reference rejects whole classes of statements at compile time that
Spark either supports outright (INSERT INTO, multi-distinct, flexible
CASE coercion) or tolerates under ANSI-off coercion. Each function here
reproduces ONE such pre-flight validation with the reference's error
message, so the clientnegative corpus (`ql/src/test/queries/
clientnegative`) gets the same FAILED behavior. Every check is scoped
narrowly (literal-only type inference, simple-identifier-only column
checks) so the 810-file clientpositive corpus is untouched — the checks
fire only on the patterns the negative files pin.

Reference anchors (cited per check): `parse/SemanticAnalyzer.java`,
`parse/DDLSemanticAnalyzer.java`, `ql/ErrorMsg.java`.
"""

from __future__ import annotations

import re

# partition-value substrings the reference reserves
# (`exec/ArchiveUtils.java` + `metastore/MetaStoreUtils` —
# default_partition_name.q, archive5.q)
RESERVED_PART_SUBSTRINGS = (
    "_INTERMEDIATE_ORIGINAL",
    "_INTERMEDIATE_ARCHIVED",
    "_INTERMEDIATE_EXTRACTED",
    "__HIVE_DEFAULT_PARTITION__",
)

# OutputFormat classes Hive accepts: implementors of HiveOutputFormat
# plus the two grandfathered Hadoop classes
# (`parse/BaseSemanticAnalyzer.java` validateFileFormat;
# fileformat_bad_class.q, fileformat_void_output.q,
# create_insert_outputformat.q)
_OUTPUTFORMAT_OK = re.compile(
    r"(Hive\w*OutputFormat|IgnoreKeyTextOutputFormat|"
    r"SequenceFileOutputFormat|RCFileOutputFormat)$")

_STORED_AS_OK = {"textfile", "sequencefile", "rcfile", "inputformat"}


def _strip_explain(stmt: str) -> str:
    return re.sub(r"(?is)^\s*EXPLAIN\s+(EXTENDED\s+)?", "", stmt.strip())


def _depth0_split(s: str, sep: str = ",") -> list[str]:
    """Split on `sep` at paren depth 0 (string-literal aware)."""
    parts, depth, cur, i, n = [], 0, [], 0, len(s)
    while i < n:
        c = s[i]
        if c == "'":
            j = s.find("'", i + 1)
            j = n - 1 if j < 0 else j
            cur.append(s[i:j + 1])
            i = j + 1
            continue
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        if c == sep and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(c)
        i += 1
    parts.append("".join(cur))
    return parts


def _find_depth0(s: str, word: str) -> bool:
    """True if `word` appears at paren depth 0 (case-insensitive)."""
    depth, i, n = 0, 0, len(s)
    wl = len(word)
    up = s.upper()
    word = word.upper()
    while i < n:
        c = s[i]
        if c == "'":
            j = s.find("'", i + 1)
            i = (n if j < 0 else j) + 1
            continue
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif depth == 0 and up.startswith(word, i) and \
                (i == 0 or not (up[i - 1].isalnum() or up[i - 1] == "_")) \
                and (i + wl >= n or not (up[i + wl].isalnum()
                                         or up[i + wl] == "_")):
            return True
        i += 1
    return False


def _select_list(body: str) -> str | None:
    """The top-level select list (text between SELECT and the first
    depth-0 FROM), or None if the statement isn't that shape."""
    m = re.match(r"(?is)^\s*SELECT\s+(?:/\*.*?\*/\s*)?(.*)$", body)
    if not m:
        return None
    rest = m.group(1)
    depth, i, n = 0, 0, len(rest)
    up = rest.upper()
    while i < n:
        c = rest[i]
        if c == "'":
            j = rest.find("'", i + 1)
            i = (n if j < 0 else j) + 1
            continue
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif depth == 0 and up.startswith("FROM", i) and \
                (i == 0 or up[i - 1] in " \t\n\r)") and \
                (i + 4 >= n or not (up[i + 4].isalnum()
                                    or up[i + 4] == "_")):
            return rest[:i]
        i += 1
    return None


def _check_date_type(stmt: str) -> None:
    """Hive 0.8 has no DATE/DATETIME column type
    (`parse/SemanticAnalyzer.java` getTypeStringFromAST → ErrorMsg
    UNSUPPORTED_TYPE; invalid_t_create1.q, invalid_t_alter1/2.q,
    invalid_t_transform.q)."""
    if re.search(r"(?i)\b\w+\s+(DATE|DATETIME)\s*[,)]", stmt) or \
            re.search(r"(?i)\bCHANGE\s+\w+\s+\w+\s+(DATE|DATETIME)\b",
                      stmt):
        # only inside DDL column lists / CHANGE / TRANSFORM AS lists
        if re.search(r"(?i)^\s*(CREATE|ALTER)\b", stmt) or \
                re.search(r"(?i)\bAS\s*\([^)]*\b(DATE|DATETIME)\s*[,)]",
                          stmt):
            raise ValueError(
                "DATE and DATETIME types aren't supported yet. Please "
                "use TIMESTAMP instead")


def _check_ctas_external(stmt: str) -> None:
    """CTAS cannot create an external table
    (`parse/SemanticAnalyzer.java` analyzeCreateTable → ErrorMsg
    CTAS_EXTTBL_COEXISTENCE; clientnegative ctas.q)."""
    if re.match(r"(?is)^\s*CREATE\s+EXTERNAL\s+TABLE\b", stmt) and \
            re.search(r"(?is)\bAS\s+SELECT\b", stmt):
        raise ValueError(
            "CREATE-TABLE-AS-SELECT cannot create external table")


def _check_subquery_insert(stmt: str) -> None:
    """INSERT inside a subquery (`parse/SemanticAnalyzer.java`
    doPhase1QBExpr → ErrorMsg NO_INSERT_INSUBQUERY; subq_insert.q)."""
    m = re.search(r"(?is)\(\s*INSERT\s+(?:OVERWRITE|INTO)\s+TABLE\s+"
                  r"([\w.]+)", stmt)
    if m:
        raise ValueError(
            f"Cannot insert in a subquery. Inserting to table  "
            f"'{m.group(1)}'")


def _check_mapjoin_outer(stmt: str, sorted_tables: set[str]) -> None:
    """A MAPJOIN hint cannot hash the preserved side of an outer join
    (`parse/SemanticAnalyzer.java` genJoinTree → ErrorMsg
    NO_OUTER_MAPJOIN: "MAPJOIN cannot be performed with OUTER JOIN";
    join2.q, smb_bucketmapjoin.q). Sort-merge-bucket joins are exempt —
    they stream both sides (smb_mapjoin_*.q hint either side, any outer
    type) — so the check skips joins whose tables were created SORTED
    BY."""
    hint = re.search(r"(?i)/\*\+\s*MAPJOIN\s*\(([^)]*)\)", stmt)
    if not hint:
        return
    hinted = {h.strip().lower() for h in hint.group(1).split(",")}
    for m in re.finditer(
            r"(?i)([\w.]+)\s+(\w+)\s+(LEFT|RIGHT|FULL)\s+OUTER\s+JOIN\s+"
            r"([\w.]+)(?:\s+(\w+))?", stmt):
        ltbl, lalias, jtype = m.group(1), m.group(2), m.group(3).upper()
        rtbl, ralias = m.group(4), (m.group(5) or m.group(4))
        if ltbl.lower() in sorted_tables and rtbl.lower() in sorted_tables:
            continue
        bad = (jtype == "FULL"
               or (jtype == "LEFT" and lalias.lower() in hinted)
               or (jtype == "RIGHT" and ralias.lower() in hinted))
        if bad:
            raise ValueError("MAPJOIN cannot be performed with OUTER JOIN")


def _check_top_level_union(body: str) -> None:
    """A UNION must live in a subquery (`parse/SemanticAnalyzer.java`
    doPhase1 → ErrorMsg UNION_NOTIN_SUBQ; clientnegative union.q)."""
    if re.match(r"(?is)^\s*SELECT\b", body) and \
            _find_depth0(body, "UNION"):
        raise ValueError(
            "Top level UNION is not supported currently; use a subquery "
            "for the UNION")


def _check_union_schema(stmt: str) -> None:
    """Union branches must agree on field names positionally
    (`parse/SemanticAnalyzer.java` genUnionPlan; union3.q negative:
    bar,baz UNION ALL baz,bar). Fires only when BOTH branches are plain
    column-reference lists (no AS, no expressions) and one is a
    permutation of the other."""
    m = re.search(
        r"(?is)SELECT\s+([\w.,\s]+?)\s+FROM\s+[\w.]+(?:\s+\w+)?\s+"
        r"UNION\s+ALL\s+SELECT\s+([\w.,\s]+?)\s+FROM\s+[\w.]+"
        r"(?:\s+\w+)?\s*\)", stmt)
    if not m:
        return

    def names(seg: str) -> list[str] | None:
        out = []
        for p in seg.split(","):
            p = p.strip()
            if not re.fullmatch(r"(?:\w+\.)?\w+", p) or \
                    re.search(r"(?i)\bAS\b", p):
                return None
            out.append(p.split(".")[-1].lower())
        return out

    left, right = names(m.group(1)), names(m.group(2))
    if left and right and left != right and sorted(left) == sorted(right):
        f = left[0]
        raise ValueError(
            f"Schema of both sides of union should match: field {f}: "
            f"appears on the left side of the UNION at column position: "
            f"{left.index(f)}, and on the right side of the UNION at "
            f"column position: {right.index(f)}. Column positions should "
            f"match for a UNION")


def _check_udtf_select(body: str) -> None:
    """UDTF select-clause restrictions (`parse/SemanticAnalyzer.java`
    genSelectPlan: ErrorMsg UDTF_LIMIT_MULTIFIELDS / UDTF_NO_GROUP_BY /
    UDTF_REQUIRE_AS; udtf_not_supported1/2/3.q,
    udtf_explode_not_supported1.q)."""
    sel = _select_list(body)
    if sel is None or not re.search(r"(?i)\bexplode\s*\(", sel):
        return
    items = [p for p in _depth0_split(sel) if p.strip()]
    if len(items) > 1:
        raise ValueError(
            "Only a single expression in the SELECT clause is supported "
            "with UDTF's")
    if re.search(r"(?i)\bGROUP\s+BY\b", body):
        raise ValueError(
            "GROUP BY is not supported with a UDTF in the SELECT clause")
    if not re.search(r"(?i)\)\s*AS\s+", sel):
        raise ValueError("UDTF's require an AS clause")


def _check_split_sample(stmt: str, qvars: dict[str, str]) -> None:
    """TABLESAMPLE(n PERCENT) validations (`parse/SemanticAnalyzer.java`
    genTablePlan splitSample; split_sample_out_of_range.q,
    split_sample_wrong_format.q)."""
    m = re.search(r"(?i)TABLESAMPLE\s*\(\s*(\d+(?:\.\d+)?)\s+PERCENT",
                  stmt)
    if not m:
        return
    pct = float(m.group(1))
    if not 0 <= pct <= 100:
        raise ValueError(
            "Sampling percentage should be between 0 and 100")
    fmt = qvars.get("hive.input.format", "")
    if fmt and not fmt.endswith("CombineHiveInputFormat"):
        raise ValueError(
            f"Percentage sampling is not supported in {fmt}")


def _check_multi_distinct_skew(body: str, qvars: dict[str, str]) -> None:
    """hive.groupby.skewindata forbids more than one DISTINCT aggregate
    per insert arm (`parse/SemanticAnalyzer.java` genGroupByPlan* →
    ErrorMsg UNSUPPORTED_MULTIPLE_DISTINCTS;
    groupby2/3[_map_skew]_multi_distinct.q). Positive skew files have at
    most one DISTINCT aggregate per arm (groupby8_map_skew.q)."""
    if qvars.get("hive.groupby.skewindata", "").strip().lower() != "true":
        return
    for arm in re.split(r"(?i)\bINSERT\s+(?:OVERWRITE|INTO)\b", body):
        if len(re.findall(r"(?i)\(\s*DISTINCT\b", arm)) > 1:
            raise ValueError(
                "DISTINCT on different columns not supported with skew "
                "in data")


def _check_uniquejoin_mixed(stmt: str) -> None:
    """UNIQUEJOIN cannot be combined with a regular JOIN — the grammar
    has no production for it (`parse/Hive.g` uniqueJoinSource;
    uniquejoin3.q)."""
    if re.search(r"(?i)\bUNIQUEJOIN\b", stmt) and \
            re.search(r"(?i)(?<![A-Z])\bJOIN\b", stmt):
        raise ValueError(
            "Parse Error: required (...)+ loop did not match anything "
            "at input 'JOIN'")


def _check_cluster_by_refs(body: str) -> None:
    """CLUSTER/DISTRIBUTE/SORT BY resolve against the select OUTPUT
    schema: a simple column reference that was aliased away is invalid
    (`parse/SemanticAnalyzer.java` genReduceSinkPlan getParseInfo →
    ErrorMsg INVALID_COLUMN; clustern3.q, clustern4.q)."""
    m = re.search(r"(?i)\bCLUSTER\s+BY\s+(.+?)(?:;|$)", body, re.S)
    if not m or re.search(r"(?i)\bTRANSFORM\s*\(", body):
        return
    from .qtest import _select_output_names
    names = _select_output_names(body)
    if not names or any(n is None for n in names):
        return
    names_l = {n.lower() for n in names}
    for tok in m.group(1).split(","):
        tok = tok.strip().rstrip(";").strip()
        if not re.fullmatch(r"(?:\w+\.)?\w+", tok):
            return
        bare = tok.split(".")[-1].lower()
        if bare not in names_l:
            raise ValueError(f"Invalid column reference '{bare}'")


def _check_reserved_partition_value(stmt: str,
                                    qvars: dict[str, str]) -> None:
    """Reserved substrings in static partition values
    (`ql/exec/DDLTask.java` addPartition → ArchiveUtils
    conflictingArchiveNameOrNull + the metastore default-partition-name
    guard; default_partition_name.q negative vs its POSITIVE twin, which
    sets hive.exec.default.partition.name to a custom value first — the
    default-name substring is only reserved while it IS the configured
    default)."""
    m = re.search(r"(?i)\bADD\s+PARTITION\s*\(([^)]*)\)", stmt)
    if not m:
        return
    reserved = list(RESERVED_PART_SUBSTRINGS)
    if qvars.get("hive.exec.default.partition.name",
                 "__HIVE_DEFAULT_PARTITION__").strip("'\"") \
            != "__HIVE_DEFAULT_PARTITION__":
        reserved.remove("__HIVE_DEFAULT_PARTITION__")
    for kv in m.group(1).split(","):
        if "=" not in kv:
            continue
        v = kv.split("=", 1)[1].strip().strip("'\"")
        for r in reserved:
            if r in v:
                raise ValueError(
                    f"Partition value contains a reserved substring "
                    f"(User value: {v} Reserved substring: {r})")


def _check_archive_form(stmt: str) -> None:
    """ARCHIVE/UNARCHIVE must name exactly one partition
    (`parse/DDLSemanticAnalyzer.java` analyzeAlterTableArchive →
    ErrorMsg ARCHIVE_ON_TABLE / ARCHIVE_ON_MULI_PARTS; archive3.q,
    archive4.q)."""
    m = re.match(r"(?is)^\s*ALTER\s+TABLE\s+[\w.]+\s+"
                 r"(ARCHIVE|UNARCHIVE)\b(.*)$", stmt)
    if not m:
        return
    verb, rest = m.group(1).upper(), m.group(2)
    nparts = len(re.findall(r"(?i)\bPARTITION\s*\(", rest))
    if nparts == 0:
        raise ValueError(f"{verb} can only be run on partitions")
    if nparts > 1:
        raise ValueError(f"{verb} can only be run on a single partition")


def _check_dyn_part_merge(stmt: str, qvars: dict[str, str]) -> None:
    """Dynamic-partition insert + merge needs
    CombineHiveInputFormat (`ql/optimizer/GenMapRedUtils` /
    SemanticAnalyzer DYNAMIC_PARTITION_MERGE; dyn_part_merge.q)."""
    m = re.search(r"(?i)\bINSERT\s+OVERWRITE\s+TABLE\s+[\w.]+\s+"
                  r"PARTITION\s*\(([^)]*)\)", stmt)
    if not m or "=" in m.group(1):
        return
    fmt = qvars.get("hive.input.format", "")
    if qvars.get("hive.merge.mapfiles", "").strip().lower() == "true" \
            and qvars.get("hive.mergejob.maponly",
                          "true").strip().lower() == "false" \
            and fmt and not fmt.endswith("CombineHiveInputFormat"):
        # with hive.mergejob.maponly (default true) a map-only merge
        # works under any input format — merge3.q / merge_dynamic_
        # partition3.q run this combination positively; only the
        # maponly=false negative (dyn_part_merge.q) fails
        raise ValueError(
            "Dynamic partition does not support merging using "
            "non-CombineHiveInputFormatPlease check your "
            "hive.input.format setting and make sure your Hadoop "
            "version support CombineFileInputFormat")


def _check_file_formats(stmt: str) -> None:
    """STORED AS file-format validation
    (`parse/BaseSemanticAnalyzer.java` handleGenericFileFormat +
    validateClass; genericFileFormat.q, fileformat_bad_class.q,
    fileformat_void_input/output.q, create_insert_outputformat.q)."""
    if not re.match(r"(?is)^\s*CREATE\b", stmt):
        return
    m = re.search(r"(?i)\bSTORED\s+AS\s+(\w+)", stmt)
    if m and m.group(1).lower() not in _STORED_AS_OK:
        raise ValueError(
            f"Unrecognized file format in STORED AS clause: "
            f"{m.group(1)}")
    mio = re.search(r"(?i)\bINPUTFORMAT\s+'([^']*)'\s+"
                    r"OUTPUTFORMAT\s+'([^']*)'", stmt)
    if mio:
        # Hive validates OUTPUT first (fileformat_bad_class.q expects
        # the output-format error even though both classes are bad)
        if not _OUTPUTFORMAT_OK.search(mio.group(2)):
            raise ValueError(
                "Output Format must implement HiveOutputFormat, "
                "otherwise it should be either IgnoreKeyTextOutputFormat "
                "or SequenceFileOutputFormat")
        if not mio.group(1).endswith("InputFormat"):
            raise ValueError("Input format must implement InputFormat")


_LIT_STR = re.compile(r"^'[^']*'$|^\"[^\"]*\"$")
_LIT_INT = re.compile(r"^-?\d+$")
_LIT_DBL = re.compile(r"^-?\d+\.\d+$")


def _lit_kind(expr: str) -> str | None:
    e = expr.strip()
    if e.upper() == "NULL":
        return "null"
    if _LIT_STR.match(e):
        return "string"
    if _LIT_INT.match(e):
        return "int"
    if _LIT_DBL.match(e):
        return "double"
    return None


def _case_group(kind: str) -> str:
    return "numeric" if kind in ("int", "double") else kind


def _check_case_types(stmt: str) -> None:
    """Hive's CASE/WHEN strict type unification for LITERAL branches
    (`udf/generic/GenericUDFCase.java` / GenericUDFWhen initialize —
    string vs numeric branches never unify, unlike Spark's ANSI-off
    coercion; udf_case_type_wrong[2,3].q, udf_when_type_wrong[2,3].q).
    Fires only when every relevant operand is a bare literal."""
    for m in re.finditer(r"(?is)\bCASE\b(.*?)\bEND\b", stmt):
        seg = m.group(1)
        head = re.split(r"(?i)\bWHEN\b", seg, 1)[0].strip()
        whens = re.findall(r"(?i)\bWHEN\b\s*(.*?)\s*\bTHEN\b", seg)
        thens = re.findall(
            r"(?i)\bTHEN\b\s*(.*?)\s*(?=\bWHEN\b|\bELSE\b|$)", seg)
        melse = re.search(r"(?is)\bELSE\b\s*(.*?)\s*$", seg)
        # CASE <expr> WHEN w: w must match <expr>'s type
        if head:
            hk = _lit_kind(head)
            if hk and hk != "null":
                for w in whens:
                    wk = _lit_kind(w)
                    if wk is None:
                        return
                    if wk != "null" and \
                            _case_group(wk) != _case_group(hk):
                        raise ValueError(
                            f"Argument type mismatch '{head}': The "
                            f"expressions after WHEN should have the "
                            f"same type with that after CASE: "
                            f'"{hk}" is expected but "{wk}" is found')
        # THEN branches must unify with each other
        kinds = [_lit_kind(t) for t in thens]
        if any(k is None for k in kinds):
            return
        seen = [k for k in kinds if k != "null"]
        if seen:
            first = seen[0]
            for t, k in zip(thens, kinds):
                if k != "null" and _case_group(k) != _case_group(first):
                    raise ValueError(
                        f"Argument type mismatch '{t.strip()}': The "
                        f"expressions after THEN should have the same "
                        f'type: "{first}" is expected but "{k}" is '
                        f"found")
            if melse:
                ek = _lit_kind(melse.group(1))
                if ek is None:
                    return
                if ek != "null" and _case_group(ek) != _case_group(first):
                    raise ValueError(
                        f"Argument type mismatch "
                        f"'{melse.group(1).strip()}': The expression "
                        f"after ELSE should have the same type as those "
                        f'after THEN: "{first}" is expected but '
                        f'"{ek}" is found')


_KNOWN_SCHEMES = {"file", "pfile", "hdfs", "har", "s3", "s3n", "s3a",
                  "viewfs"}


def _check_change_after(stmt: str, spark) -> None:
    """ALTER TABLE ... CHANGE ... AFTER <col>: the anchor column must
    exist (`exec/DDLTask.java` alterTable → "Column 'x' does not exist";
    column_rename4.q)."""
    m = re.match(r"(?is)^\s*ALTER\s+TABLE\s+`?([\w.]+)`?\s+CHANGE\b"
                 r".*\bAFTER\s+`?(\w+)`?\s*$", stmt)
    if not m:
        return
    try:
        cols = {c.name.lower()
                for c in spark.catalog.listColumns(m.group(1))}
    except Exception:
        return
    if m.group(2).lower() not in cols:
        raise ValueError(f"Column '{m.group(2)}' does not exist")


def _check_hold_ddltime(stmt: str, spark) -> None:
    """The HOLD_DDLTIME hint requires an EXISTING static partition
    (`parse/SemanticAnalyzer.java` genFileSinkPlan → ErrorMsg
    HOLD_DDLTIME_ON_NONEXIST_PARTITIONS; clientnegative ddltime.q; the
    positive ddltime.q hints a partition an earlier insert created)."""
    if not re.search(r"(?i)HOLD_DDLTIME", stmt):
        return
    m = re.search(r"(?is)\bINSERT\s+OVERWRITE\s+TABLE\s+`?([\w.]+)`?\s+"
                  r"PARTITION\s*\(([^)]*)\)", stmt)
    if not m:
        return
    err = ValueError(
        "HOLD_DDLTIME hint cannot be applied to dynamic partitions or "
        "non-existent partitions")
    pairs = []
    for kv in m.group(2).split(","):
        if "=" not in kv:
            raise err
        k, v = kv.split("=", 1)
        pairs.append(f"{k.strip().lower()}={v.strip().strip(chr(39))}")
    want = "/".join(pairs)
    try:
        rows = [r[0] for r in spark.sql(
            f"SHOW PARTITIONS {m.group(1)}").collect()]
    except Exception:
        return
    if want not in rows:
        raise err


def _check_location_scheme(stmt: str) -> None:
    """Unknown filesystem scheme in a LOCATION clause
    (`metadata/Hive.java` getTable/createTable path resolution raises
    IOException "No FileSystem for scheme"; external1.q, external2.q —
    the positive corpus only uses pfile:// and file://)."""
    m = re.search(r"(?i)\bLOCATION\s+'(\w+)://", stmt)
    if m and m.group(1).lower() not in _KNOWN_SCHEMES:
        raise ValueError(
            f"MetaException(message:Got exception: java.io.IOException "
            f"No FileSystem for scheme: {m.group(1)})")


def _check_max_created_files(stmt: str, qvars: dict[str, str],
                             spark) -> None:
    """hive.exec.max.created.files: a dynamic-partition insert that
    would create more files than the cap fails at execution
    (`exec/FileSinkOperator.java` updateProgress → "total number of
    created files exceeds"; dyn_part3.q caps at 100 and selects 309
    distinct partition values). Emulated for the single-table
    SELECT shape with an exact distinct-count of the dynamic column."""
    limit = qvars.get("hive.exec.max.created.files")
    if not limit:
        return
    m = re.match(r"(?is)^\s*INSERT\s+OVERWRITE\s+TABLE\s+[\w.]+\s+"
                 r"PARTITION\s*\(([^)=]*)\)\s*SELECT\s+(.+?)\s+FROM\s+"
                 r"([\w.]+)\s*(?:WHERE\b.*?)?;?\s*$", stmt)
    if not m:
        return
    last = _depth0_split(m.group(2))[-1].strip()
    if not re.fullmatch(r"(?:\w+\.)?\w+", last):
        return
    try:
        n = spark.sql(f"SELECT count(DISTINCT {last}) "
                      f"FROM {m.group(3)}").first()[0]
    except Exception:
        return
    if n > int(limit):
        raise ValueError(
            "total number of created files exceeds "
            "hive.exec.max.created.files. Killing the job. (Execution "
            "Error, return code 2 from "
            "org.apache.hadoop.hive.ql.exec.MapRedTask)")


def _check_serde_jar(stmt: str, resources) -> None:
    """A SERDE class provided by an ADDed jar becomes unloadable after
    DELETE JAR (`exec/DDLTask.java` validateSerDe; deletejar.q — the
    positive corpus ADDs TestSerDe.jar and keeps it)."""
    m = re.search(r"(?i)\bROW\s+FORMAT\s+SERDE\s+'([\w.]*TestSerDe)'",
                  stmt)
    if not m:
        return
    if not any(k.lower() == "jar" and "testserde" in r.lower()
               for k, r in resources):
        raise ValueError(
            f"Cannot validate serde: {m.group(1)} (Execution Error, "
            f"return code 1 from org.apache.hadoop.hive.ql.exec.DDLTask)")


_STORED_AS_IOF = {
    "textfile": ("org.apache.hadoop.mapred.TextInputFormat",
                 "org.apache.hadoop.hive.ql.io."
                 "HiveIgnoreKeyTextOutputFormat"),
    "sequencefile": ("org.apache.hadoop.mapred.SequenceFileInputFormat",
                     "org.apache.hadoop.hive.ql.io."
                     "HiveSequenceFileOutputFormat"),
    "rcfile": ("org.apache.hadoop.hive.ql.io.RCFileInputFormat",
               "org.apache.hadoop.hive.ql.io.RCFileOutputFormat"),
}


def storage_fingerprint(create_stmt: str | None) -> dict:
    """Canonical storage descriptor of a CREATE TABLE statement — the
    fields `parse/ImportSemanticAnalyzer.java` checkTable compares when
    IMPORT targets an existing table (exim_06-11 negatives). Defaults
    mirror Hive 0.8: textfile container, LazySimpleSerDe (ColumnarSerDe
    under RCFILE), serialization.format '1', no bucketing/sorting."""
    s = create_stmt or ""
    mio = re.search(r"(?i)\bINPUTFORMAT\s+['\"]([^'\"]*)['\"]\s+"
                    r"OUTPUTFORMAT\s+['\"]([^'\"]*)['\"]", s)
    sa = re.search(r"(?i)\bSTORED\s+AS\s+(\w+)", s)
    fmt = (sa.group(1).lower() if sa else "textfile")
    iof = (mio.group(1), mio.group(2)) if mio else \
        _STORED_AS_IOF.get(fmt, _STORED_AS_IOF["textfile"])
    sd = re.search(r"(?i)\bROW\s+FORMAT\s+SERDE\s+['\"]([^'\"]*)['\"]", s)
    serde = sd.group(1) if sd else (
        "org.apache.hadoop.hive.serde2.columnar.ColumnarSerDe"
        if fmt == "rcfile"
        else "org.apache.hadoop.hive.serde2.lazy.LazySimpleSerDe")
    props = {"serialization.format": "1"}
    sp = re.search(r"(?i)\bWITH\s+SERDEPROPERTIES\s*\(([^)]*)\)", s)
    if sp:
        for kv in sp.group(1).split(","):
            if "=" in kv:
                k, v = kv.split("=", 1)
                props[k.strip().strip("'\"")] = v.strip().strip("'\"")
    cb = re.search(r"(?i)\bCLUSTERED\s+BY\s*\(([^)]*)\).*?"
                   r"INTO\s+(\d+)\s+BUCKETS", s, re.S)
    buckets = (tuple(c.strip().lower() for c in cb.group(1).split(",")),
               int(cb.group(2))) if cb else None
    sb = re.search(r"(?i)\bSORTED\s+BY\s*\(([^)]*)\)", s)
    sort = tuple(" ".join(c.split()).lower()
                 for c in sb.group(1).split(",")) if sb else None
    return {"iof": iof, "serde": serde,
            "format": props.get("serialization.format", "1"),
            "buckets": buckets, "sort": sort}


def check_import_compat(existing: dict, dump: dict) -> None:
    """IMPORT over an existing table: storage descriptors must match
    (`parse/ImportSemanticAnalyzer.java` checkTable, in its check
    order; exim_06-11 negative corpus)."""
    def err(detail: str):
        raise ValueError(
            "The existing table is not compatible with the import "
            f"spec.   {detail}")
    if existing["iof"] != dump["iof"]:
        err("Table inputformat/outputformats do not match")
    if existing["serde"] != dump["serde"]:
        err("Table Serde class does not match")
    if existing["format"] != dump["format"]:
        err("Table Serde format does not match")
    if existing["buckets"] != dump["buckets"]:
        err("Table bucketing spec does not match")
    if existing["sort"] != dump["sort"]:
        err("Table sorting spec does not match")


def check_statement_catalog(stmt: str, qvars: dict[str, str], spark,
                            resources=()) -> None:
    """Catalog-/state-dependent Hive-0.8 validations (complement of
    `check_statement`, same call site)."""
    _check_change_after(stmt, spark)
    _check_hold_ddltime(stmt, spark)
    _check_location_scheme(stmt)
    _check_max_created_files(stmt, qvars, spark)
    _check_serde_jar(stmt, resources)


def _check_substr_arg_types(stmt: str) -> None:
    """substr's position argument must be numeric — Hive resolves UDF
    overloads strictly (`udf/UDFSubstr.java`; parser-corpus
    invalid_function_param2.q) where Spark's ANSI-off coercion would
    quietly NULL the cast."""
    # the qfile text pre-rewrites substr( → hive_substr( for the
    # edge-semantics shim, so match both spellings
    m = re.search(r"(?i)\b(?:hive_)?substr(?:ing)?\s*\(\s*[^,()]*,\s*"
                  r"('[^']*'|\"[^\"]*\")", stmt)
    if m:
        raise ValueError(
            f"Wrong arguments {m.group(1)}: No matching method for "
            "class org.apache.hadoop.hive.ql.udf.UDFSubstr with "
            "(string, string). Possible choices: _FUNC_(string, int, "
            "int)  _FUNC_(string, int)")


def _check_index_exprs(stmt: str) -> None:
    """Array/map subscript rules (`parse/TypeCheckProcFactory.java`
    getXpathOrFuncExprNodeDesc: array indexes must be constant INTEGER
    literals, map indexes constant literals of the KEY type; parser
    corpus invalid_list_index2.q, invalid_map_index[2].q — the fixture
    map `mstringstring` is map<string,string>). String literals are
    masked first so regex character classes inside quotes never look
    like subscripts."""
    masked = re.sub(r"'[^']*'|\"[^\"]*\"", "§STR§", stmt)
    for m in re.finditer(r"(\w+)\s*\[([^\][]*)\]", masked):
        col, sub = m.group(1).lower(), m.group(2).strip()
        if col == "mstringstring":
            if sub == "§STR§":
                continue
            if re.fullmatch(r"-?\d+", sub):
                raise ValueError(
                    f"MAP key type does not match index expression "
                    f"type '{sub}'")
            raise ValueError(
                "Non-constant expression for map indexes not supported")
        if re.search(r"[-+*/%]|\w+\s*\(", sub) and "§STR§" not in sub:
            raise ValueError(
                "Non-constant expressions for array indexes not "
                "supported")


def _check_reflect_targets(stmt: str) -> None:
    """reflect() with a nonexistent class/method fails the MR task
    (`udf/generic/GenericUDFReflect.java` evaluate; udf_reflect_neg.q).
    The UDF itself stays NULL-on-unknown because Spark eagerly evaluates
    untaken CASE branches (udf_case.q ELSE reflect bogus), so the
    validation is a pre-flight on statements with NO CASE."""
    if re.search(r"(?i)\bCASE\b", stmt):
        return
    from ..functions.hive_compat import _REFLECT_METHODS
    for m in re.finditer(r"(?i)\breflect\s*\(\s*['\"]([\w.]+)['\"]\s*,"
                         r"\s*['\"](\w+)['\"]", stmt):
        if (m.group(1), m.group(2)) not in _REFLECT_METHODS:
            raise ValueError(
                "UDFReflect evaluate: "
                f"{m.group(1)}.{m.group(2)} not found (Execution Error, "
                "return code 2 from "
                "org.apache.hadoop.hive.ql.exec.MapRedTask)")


def check_statement(stmt: str, qvars: dict[str, str],
                    sorted_tables: set[str]) -> None:
    """Run every statement-level Hive-0.8 validation; raises ValueError
    with the reference's error text on the first violation."""
    body = _strip_explain(stmt)
    _check_date_type(stmt)
    _check_ctas_external(stmt)
    _check_subquery_insert(stmt)
    _check_mapjoin_outer(stmt, sorted_tables)
    _check_top_level_union(body)
    _check_union_schema(stmt)
    _check_udtf_select(body)
    _check_split_sample(stmt, qvars)
    _check_multi_distinct_skew(body, qvars)
    _check_uniquejoin_mixed(stmt)
    _check_cluster_by_refs(body)
    _check_reserved_partition_value(stmt, qvars)
    _check_archive_form(stmt)
    _check_dyn_part_merge(stmt, qvars)
    _check_file_formats(stmt)
    _check_case_types(stmt)
    _check_reflect_targets(stmt)
    _check_substr_arg_types(stmt)
    _check_index_exprs(stmt)
