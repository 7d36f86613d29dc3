"""Scalar-function surface queries (SURVEY §2.9-2.12) + DuckDB oracles.

One query per function family; every function exercised on real table
columns so the oracle checks end-to-end values, not constant folding.
Reference registry lines cited per family in the SQL comments.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.hive_compat import create_union, field, hive_hash
from .base import ensure_views, sql_query


# --- string family (FunctionRegistry.java:223-286,420-425) ---
_STRING_BASIC = sql_query("""
    SELECT n_nationkey,
      concat(n_name, '_x')            AS c_concat,
      substr(n_name, 2, 3)            AS c_substr,
      substr(n_name, -3)              AS c_substr_neg,
      upper(n_name)                   AS c_upper,
      lower(n_name)                   AS c_lower,
      trim(concat('  ', n_name, ' ')) AS c_trim,
      ltrim(concat('  ', n_name))     AS c_ltrim,
      rtrim(concat(n_name, '  '))     AS c_rtrim,
      length(n_name)                  AS c_length,
      reverse(n_name)                 AS c_reverse,
      repeat(n_name, 2)               AS c_repeat,
      ascii(n_name)                   AS c_ascii,
      lpad(n_name, 12, '*')           AS c_lpad,
      rpad(n_name, 12, '*')           AS c_rpad,
      concat(space(2), n_name)        AS c_space
    FROM nation
""")

_STRING_REGEX = sql_query("""
    SELECT p_partkey,
      p_name LIKE '%er%'                                   AS c_like,
      p_name RLIKE '[aeiou]{2}'                            AS c_rlike,
      regexp_replace(p_name, '[aeiou]', '_')               AS c_regexp_replace,
      regexp_extract(p_name, '([a-z]+)', 1)                AS c_regexp_extract,
      instr(p_name, 'a')                                   AS c_instr,
      locate('e', p_name)                                  AS c_locate,
      find_in_set(p_brand, 'BrandA,BrandB,BrandC')         AS c_find_in_set,
      concat_ws('-', p_brand, p_type)                      AS c_concat_ws,
      size(split(p_name, ' '))                             AS c_split_size,
      split(p_name, ' ')[0]                                AS c_split_first,
      elt(CAST(p_partkey % 2 + 1 AS INT), p_brand, p_type) AS c_elt
    FROM part
""")


def _field_union(spark, sf_dir):
    """field()/create_union()/hive hash (registry :276,:413,:417)."""
    dfs = ensure_views(spark, sf_dir)
    o = dfs["orders"]
    cu = create_union((F.col("o_orderkey") % 2).cast("int"),
                      F.col("o_totalprice"), F.col("o_orderkey"))
    return o.select(
        "o_orderkey",
        field(F.col("o_orderpriority"),
              F.lit("1-URGENT"), F.lit("2-HIGH"), F.lit("3-MEDIUM")).alias("c_field"),
        cu.getField("tag").alias("u_tag"),
        cu.getField("field0").alias("u_f0"),
        cu.getField("field1").alias("u_f1"),
    )


def _hive_hash_q(spark, sf_dir):
    """hash() bit-parity (`ObjectInspectorUtils.hashCode:404-445`: strings
    fold seed-0 r*31+byte, booleans 1/0, longs (v>>>32)^v; golden-anchored
    by the insert_into qfile oracles)."""
    dfs = ensure_views(spark, sf_dir)
    n = dfs["nation"]
    big = (F.col("n_nationkey").cast("bigint") * 1000000007).cast("bigint")
    return n.select(
        "n_nationkey",
        hive_hash(F.col("n_name"), "string").alias("h_str"),
        hive_hash(F.col("n_nationkey"), "int").alias("h_int"),
        hive_hash(big, "bigint").alias("h_big"),
        hive_hash(F.col("n_nationkey") % 2 == 0, "boolean").alias("h_bool"),
    )


_MATH = sql_query("""
    SELECT s_suppkey,
      round(s_acctbal, 1)                       AS m_round,
      CAST(floor(s_acctbal) AS BIGINT)          AS m_floor,
      CAST(ceil(s_acctbal) AS BIGINT)           AS m_ceil,
      round(abs(s_acctbal - 5000.0), 6)         AS m_abs,
      pmod(s_suppkey * 7 - 50, 13)              AS m_pmod,
      round(ln(s_suppkey + 1), 9)               AS m_ln,
      round(log2(s_suppkey + 1), 9)             AS m_log2,
      round(log10(s_suppkey + 1), 9)            AS m_log10,
      round(exp(CAST(s_suppkey % 5 AS DOUBLE)), 9) AS m_exp,
      round(power(s_suppkey, 2), 1)             AS m_pow,
      round(sqrt(s_suppkey), 9)                 AS m_sqrt,
      CAST(sign(s_acctbal - 5000.0) AS INT)     AS m_sign,
      round(sin(s_suppkey), 9)                  AS m_sin,
      round(cos(s_suppkey), 9)                  AS m_cos,
      round(tan(s_suppkey), 9)                  AS m_tan,
      round(asin(CAST(s_suppkey % 3 - 1 AS DOUBLE)), 9) AS m_asin,
      round(acos(CAST(s_suppkey % 3 - 1 AS DOUBLE)), 9) AS m_acos,
      round(atan(s_suppkey), 9)                 AS m_atan,
      round(degrees(s_suppkey), 6)              AS m_degrees,
      round(radians(s_suppkey), 9)              AS m_radians,
      round(pi(), 9)                            AS m_pi,
      round(e(), 9)                             AS m_e,
      s_suppkey & 5                             AS m_band,
      s_suppkey | 5                             AS m_bor,
      s_suppkey ^ 5                             AS m_bxor,
      ~s_suppkey                                AS m_bnot,
      s_suppkey div 3                           AS m_div,
      s_suppkey % 7                             AS m_mod
    FROM supplier
""")

_HEX_CONV = sql_query("""
    SELECT n_nationkey,
      hex(n_nationkey * 97)                          AS c_hex,
      bin(n_nationkey * 97)                          AS c_bin,
      conv(CAST(n_nationkey * 97 AS STRING), 10, 16) AS c_conv16,
      conv(bin(n_nationkey * 97), 2, 10)             AS c_conv_back,
      hex(n_name)                                    AS c_hex_str,
      decode(unhex(hex(n_name)), 'UTF-8')            AS c_unhex_roundtrip
    FROM nation
""")

_DATETIME = sql_query("""
    SELECT event_id,
      year(ts)    AS d_year,
      month(ts)   AS d_month,
      day(ts)     AS d_day,
      hour(ts)    AS d_hour,
      minute(ts)  AS d_minute,
      second(ts)  AS d_second,
      weekofyear(ts) AS d_week,
      CAST(to_date(ts) AS STRING)                AS d_to_date,
      CAST(date_add(to_date(ts), 30) AS STRING)  AS d_date_add,
      CAST(date_sub(to_date(ts), 7) AS STRING)   AS d_date_sub,
      datediff(to_date(ts), to_date(TIMESTAMP '2024-01-01 00:00:00')) AS d_datediff,
      CAST(unix_timestamp(ts) AS BIGINT)         AS d_unix,
      from_unixtime(CAST(unix_timestamp(ts) AS BIGINT)) AS d_from_unix,
      date_format(ts, 'yyyy-MM-dd HH:mm:ss')     AS d_fmt
    FROM events
""")

_CONDITIONAL = sql_query("""
    SELECT c_custkey,
      if(c_acctbal > 0, 'pos', 'nonpos')                         AS k_if,
      CASE WHEN c_acctbal > 5000 THEN 'high'
           WHEN c_acctbal > 0 THEN 'mid' ELSE 'low' END          AS k_case,
      coalesce(CASE WHEN c_mktsegment = 'BUILDING' THEN NULL
                    ELSE c_mktsegment END, 'B!')                 AS k_coalesce,
      c_custkey IN (1, 2, 3, 999)                                AS k_in,
      isnull(CAST(concat('x', c_name) AS INT))                   AS k_isnull,
      isnotnull(c_acctbal)                                       AS k_isnotnull,
      CAST(c_acctbal AS INT)                                     AS k_trunc_cast,
      CAST(c_custkey AS DOUBLE) / 0                              AS k_div0,
      CAST(CAST(c_custkey AS STRING) AS INT)                     AS k_str_roundtrip,
      not (c_acctbal > 0)                                        AS k_not
    FROM customer
""")

_COMPLEX = sql_query("""
    SELECT p_partkey,
      size(array(p_size, p_size + 1, p_size + 2))       AS a_size,
      array(p_size, p_size + 1)[0]                      AS a_first,
      array_contains(array(p_brand, p_type), 'SMALL')   AS a_has,
      sort_array(array(p_type, p_brand))[0]             AS a_sorted_first,
      str_to_map(concat('sz:', p_size, ',tp:', p_type), ',', ':')['sz'] AS m_sz,
      size(str_to_map(concat('sz:', p_size, ',tp:', p_type), ',', ':')) AS m_size,
      array_join(sort_array(map_keys(
        str_to_map(concat('sz:', p_size, ',tp:', p_type), ',', ':'))), ',') AS m_keys,
      array_join(map_values(map('a', p_brand)), ',')    AS m_vals,
      named_struct('a', p_size, 'b', p_type).b          AS st_b,
      struct(p_size, p_type).p_size                     AS st_size
    FROM part
""")

_JSON = sql_query("""
    SELECT event_id,
      get_json_object(props, '$.k')               AS j_str,
      CAST(get_json_object(props, '$.k') AS INT)  AS j_int,
      jt.k                                        AS j_tuple
    FROM events
    LATERAL VIEW json_tuple(props, 'k') jt AS k
""")

_URL = sql_query("""
    SELECT n_nationkey,
      parse_url(u, 'HOST')        AS u_host,
      parse_url(u, 'PATH')        AS u_path,
      parse_url(u, 'QUERY')       AS u_query,
      parse_url(u, 'QUERY', 'id') AS u_qid,
      parse_url(u, 'PROTOCOL')    AS u_proto
    FROM (SELECT n_nationkey,
                 concat('http://ex', n_regionkey, '.com/p/', n_nationkey,
                        '?id=', n_nationkey * 3, '&z=1') AS u
          FROM nation) t
""")

_XPATH = sql_query("""
    SELECT p_partkey,
      xpath_string(x, 'a/b')                   AS x_str,
      xpath_int(x, 'a/c')                      AS x_int,
      array_join(xpath(x, 'a/d/text()'), ',')  AS x_list
    FROM (SELECT p_partkey,
                 concat('<a><b>', p_type, '</b><c>', p_size,
                        '</c><d>1</d><d>2</d></a>') AS x
          FROM part) t
""")

_SENTENCES = sql_query("""
    SELECT doc_id,
      array_join(flatten(sentences(text)), ' ') AS tokens_joined,
      size(flatten(sentences(text)))            AS n_tokens
    FROM documents WHERE doc_id < 100
""")

_LATERAL_EXPLODE = sql_query("""
    SELECT doc_id, tok
    FROM documents LATERAL VIEW explode(split(text, ' ')) t AS tok
    WHERE doc_id < 50
""")

_LATERAL_POSEXPLODE = sql_query("""
    SELECT doc_id, pos, tok
    FROM documents LATERAL VIEW posexplode(split(text, ' ')) t AS pos, tok
    WHERE doc_id < 50
""")

_TRANSFORM = sql_query("""
    SELECT TRANSFORM(o_orderkey, o_orderstatus)
    USING 'cat' AS (k STRING, s STRING)
    FROM orders
""")


QUERIES = {
    "fn_string_basic": _STRING_BASIC,
    "fn_string_regex": _STRING_REGEX,
    "fn_field_union": _field_union,
    "fn_hive_hash": _hive_hash_q,
    "fn_math": _MATH,
    "fn_hex_conv": _HEX_CONV,
    "fn_datetime": _DATETIME,
    "fn_conditional": _CONDITIONAL,
    "fn_complex_types": _COMPLEX,
    "fn_json": _JSON,
    "fn_url": _URL,
    "fn_xpath": _XPATH,
    "fn_sentences": _SENTENCES,
    "lateral_view_explode": _LATERAL_EXPLODE,
    "lateral_view_posexplode": _LATERAL_POSEXPLODE,
    "transform_script": _TRANSFORM,
}


ORACLE = {
    "fn_string_basic": """
        SELECT n_nationkey,
          n_name || '_x'                  AS c_concat,
          substr(n_name, 2, 3)            AS c_substr,
          substr(n_name, -3)              AS c_substr_neg,
          upper(n_name)                   AS c_upper,
          lower(n_name)                   AS c_lower,
          trim('  ' || n_name || ' ')     AS c_trim,
          ltrim('  ' || n_name)           AS c_ltrim,
          rtrim(n_name || '  ')           AS c_rtrim,
          length(n_name)                  AS c_length,
          reverse(n_name)                 AS c_reverse,
          repeat(n_name, 2)               AS c_repeat,
          ascii(n_name)                   AS c_ascii,
          lpad(n_name, 12, '*')           AS c_lpad,
          rpad(n_name, 12, '*')           AS c_rpad,
          repeat(' ', 2) || n_name        AS c_space
        FROM nation
    """,
    "fn_string_regex": """
        SELECT p_partkey,
          p_name LIKE '%er%'                                     AS c_like,
          regexp_matches(p_name, '[aeiou]{2}')                   AS c_rlike,
          regexp_replace(p_name, '[aeiou]', '_', 'g')            AS c_regexp_replace,
          regexp_extract(p_name, '([a-z]+)', 1)                  AS c_regexp_extract,
          strpos(p_name, 'a')                                    AS c_instr,
          strpos(p_name, 'e')                                    AS c_locate,
          list_position(string_split('BrandA,BrandB,BrandC', ','), p_brand) AS c_find_in_set,
          concat_ws('-', p_brand, p_type)                        AS c_concat_ws,
          len(string_split(p_name, ' '))                         AS c_split_size,
          string_split(p_name, ' ')[1]                           AS c_split_first,
          CASE WHEN p_partkey % 2 + 1 = 1 THEN p_brand ELSE p_type END AS c_elt
        FROM part
    """,
    "fn_field_union": """
        SELECT o_orderkey,
          CASE o_orderpriority WHEN '1-URGENT' THEN 1 WHEN '2-HIGH' THEN 2
               WHEN '3-MEDIUM' THEN 3 ELSE 0 END AS c_field,
          CAST(o_orderkey % 2 AS INT)    AS u_tag,
          o_totalprice                   AS u_f0,
          o_orderkey                     AS u_f1
        FROM orders
    """,
    "fn_hive_hash": """
        SELECT n_nationkey,
          CAST(CASE WHEN h >= 2147483648 THEN h - 4294967296 ELSE h END AS INT) AS h_str,
          n_nationkey AS h_int,
          CAST(CASE WHEN hb >= 2147483648 THEN hb - 4294967296 ELSE hb END AS INT) AS h_big,
          CASE WHEN n_nationkey % 2 = 0 THEN 1 ELSE 0 END AS h_bool
        FROM (
          SELECT n_nationkey,
            list_reduce(
              list_prepend(CAST(0 AS HUGEINT),
                           [CAST(unicode(c) AS HUGEINT) for c in string_split(n_name, '')]),
              (a, b) -> (a * 31 + b) % 4294967296
            ) AS h,
            xor(CAST(n_nationkey AS BIGINT) * 1000000007,
                (CAST(n_nationkey AS BIGINT) * 1000000007) // 4294967296) % 4294967296 AS hb
          FROM nation
        ) t
    """,
    "fn_math": """
        SELECT s_suppkey,
          round(s_acctbal, 1)                       AS m_round,
          CAST(floor(s_acctbal) AS BIGINT)          AS m_floor,
          CAST(ceil(s_acctbal) AS BIGINT)           AS m_ceil,
          round(abs(s_acctbal - 5000.0), 6)         AS m_abs,
          ((s_suppkey * 7 - 50) % 13 + 13) % 13     AS m_pmod,
          round(ln(s_suppkey + 1), 9)               AS m_ln,
          round(log2(s_suppkey + 1), 9)             AS m_log2,
          round(log10(s_suppkey + 1), 9)            AS m_log10,
          round(exp(CAST(s_suppkey % 5 AS DOUBLE)), 9) AS m_exp,
          round(pow(s_suppkey, 2), 1)               AS m_pow,
          round(sqrt(s_suppkey), 9)                 AS m_sqrt,
          CAST(sign(s_acctbal - 5000.0) AS INT)     AS m_sign,
          round(sin(s_suppkey), 9)                  AS m_sin,
          round(cos(s_suppkey), 9)                  AS m_cos,
          round(tan(s_suppkey), 9)                  AS m_tan,
          round(asin(CAST(s_suppkey % 3 - 1 AS DOUBLE)), 9) AS m_asin,
          round(acos(CAST(s_suppkey % 3 - 1 AS DOUBLE)), 9) AS m_acos,
          round(atan(s_suppkey), 9)                 AS m_atan,
          round(degrees(s_suppkey), 6)              AS m_degrees,
          round(radians(s_suppkey), 9)              AS m_radians,
          round(pi(), 9)                            AS m_pi,
          round(exp(1), 9)                          AS m_e,
          s_suppkey & 5                             AS m_band,
          s_suppkey | 5                             AS m_bor,
          xor(s_suppkey, 5)                         AS m_bxor,
          ~s_suppkey                                AS m_bnot,
          s_suppkey // 3                            AS m_div,
          s_suppkey % 7                             AS m_mod
        FROM supplier
    """,
    "fn_hex_conv": """
        SELECT n_nationkey,
          hex(n_nationkey * 97)                 AS c_hex,
          bin(n_nationkey * 97)                 AS c_bin,
          hex(n_nationkey * 97)                 AS c_conv16,
          CAST(n_nationkey * 97 AS VARCHAR)     AS c_conv_back,
          hex(n_name)                           AS c_hex_str,
          n_name                                AS c_unhex_roundtrip
        FROM nation
    """,
    "fn_datetime": """
        SELECT event_id,
          year(ts)      AS d_year,
          month(ts)     AS d_month,
          day(ts)       AS d_day,
          hour(ts)      AS d_hour,
          minute(ts)    AS d_minute,
          CAST(second(ts) AS INT) AS d_second,
          weekofyear(ts) AS d_week,
          strftime(ts, '%Y-%m-%d')                             AS d_to_date,
          strftime(CAST(ts AS DATE) + INTERVAL 30 DAY, '%Y-%m-%d') AS d_date_add,
          strftime(CAST(ts AS DATE) - INTERVAL 7 DAY, '%Y-%m-%d')  AS d_date_sub,
          datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d_datediff,
          CAST(floor(epoch(ts)) AS BIGINT)                     AS d_unix,
          strftime(to_timestamp(floor(epoch(ts))), '%Y-%m-%d %H:%M:%S') AS d_from_unix,
          strftime(ts, '%Y-%m-%d %H:%M:%S')                    AS d_fmt
        FROM events
    """,
    "fn_conditional": """
        SELECT c_custkey,
          if(c_acctbal > 0, 'pos', 'nonpos')                         AS k_if,
          CASE WHEN c_acctbal > 5000 THEN 'high'
               WHEN c_acctbal > 0 THEN 'mid' ELSE 'low' END          AS k_case,
          coalesce(CASE WHEN c_mktsegment = 'BUILDING' THEN NULL
                        ELSE c_mktsegment END, 'B!')                 AS k_coalesce,
          c_custkey IN (1, 2, 3, 999)                                AS k_in,
          TRY_CAST('x' || c_name AS INT) IS NULL                     AS k_isnull,
          c_acctbal IS NOT NULL                                      AS k_isnotnull,
          CAST(trunc(c_acctbal) AS INT)                              AS k_trunc_cast,
          CAST(c_custkey AS DOUBLE) / 0                              AS k_div0,
          CAST(CAST(c_custkey AS VARCHAR) AS INT)                    AS k_str_roundtrip,
          NOT (c_acctbal > 0)                                        AS k_not
        FROM customer
    """,
    "fn_complex_types": """
        SELECT p_partkey,
          3                                        AS a_size,
          p_size                                   AS a_first,
          (p_brand = 'SMALL' OR p_type = 'SMALL')  AS a_has,
          least(p_type, p_brand)                   AS a_sorted_first,
          CAST(p_size AS VARCHAR)                  AS m_sz,
          2                                        AS m_size,
          'sz,tp'                                  AS m_keys,
          p_brand                                  AS m_vals,
          p_type                                   AS st_b,
          p_size                                   AS st_size
        FROM part
    """,
    "fn_json": """
        SELECT event_id,
          json_extract_string(props, '$.k')               AS j_str,
          CAST(json_extract_string(props, '$.k') AS INT)  AS j_int,
          json_extract_string(props, '$.k')               AS j_tuple
        FROM events
    """,
    "fn_url": """
        SELECT n_nationkey,
          'ex' || n_regionkey || '.com'            AS u_host,
          '/p/' || n_nationkey                     AS u_path,
          'id=' || n_nationkey * 3 || '&z=1'       AS u_query,
          CAST(n_nationkey * 3 AS VARCHAR)         AS u_qid,
          'http'                                   AS u_proto
        FROM nation
    """,
    "fn_xpath": """
        SELECT p_partkey,
          p_type                     AS x_str,
          p_size                     AS x_int,
          '1,2'                      AS x_list
        FROM part
    """,
    "fn_sentences": """
        SELECT doc_id, text AS tokens_joined,
               len(string_split(text, ' ')) AS n_tokens
        FROM documents WHERE doc_id < 100
    """,
    "lateral_view_explode": """
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        FROM documents WHERE doc_id < 50
    """,
    "lateral_view_posexplode": """
        SELECT doc_id,
               generate_subscripts(string_split(text, ' '), 1) - 1 AS pos,
               unnest(string_split(text, ' ')) AS tok
        FROM documents WHERE doc_id < 50
    """,
    "transform_script": """
        SELECT CAST(o_orderkey AS VARCHAR) AS k, o_orderstatus AS s FROM orders
    """,
}
