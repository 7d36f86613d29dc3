"""Interactive CLI — the user-facing entry point.

The analogue of the reference's CliDriver
(`cli/src/java/org/apache/hadoop/hive/cli/CliDriver.java:551` main /
`:76` processCmd): a REPL plus `-e '<query>'` one-shot and `-f file.q`
script modes over :class:`~hive_nexr_spark.hiveql.HiveQLSession`, with the
testdata tables pre-registered as views. Statements are split on `;` like
CliDriver's processLine; `set k=v`, `quit`/`exit`, and `source file.q`
are handled locally, everything else goes through the HiveQL dialect
facade (TABLESAMPLE BUCKET rewrite, CREATE TEMPORARY FUNCTION, LOAD DATA,
ALTER TABLE CONCATENATE, ADD/LIST/DELETE FILE, ...).

Usage::

    python -m hive_nexr_spark.cli                       # REPL
    python -m hive_nexr_spark.cli -e 'SELECT ...;'
    python -m hive_nexr_spark.cli -f query.q [--sf-dir DIR]
"""

from __future__ import annotations

import argparse
import sys


def _process_line(hql, line: str, max_rows: int) -> None:
    """CliDriver.processLine: split on ';', dispatch each statement.

    Comment-only lines are stripped BEFORE splitting (same pass as the
    qfile runner's _strip_comments) — splitting first would leave a
    leading '--' line attached to the following SQL and silently drop
    the whole statement. The split itself is quote-aware
    (_split_statements), so a ';' inside a string literal
    (`SELECT 'a;b'`) doesn't break the statement in two."""
    import re

    from .sources.qtest import _split_statements, _strip_comments

    for stmt in _split_statements(_strip_comments(line)):
        stmt = stmt.strip()
        if not stmt:
            continue
        low = stmt.lower()
        if low in ("quit", "exit"):
            raise EOFError
        if low.startswith("source "):
            with open(stmt[7:].strip()) as fh:
                _process_line(hql, fh.read(), max_rows)
            continue
        m = re.match(r"^set\s+([\w.]+)\s*=\s*(.*)$", stmt, re.IGNORECASE)
        if m:
            try:
                hql.spark.conf.set(m.group(1), m.group(2).strip())
            except Exception as exc:  # static conf etc. — report, keep going
                print(f"set failed: {exc}", file=sys.stderr)
            continue
        df = hql.sql(stmt)
        if df is not None:
            df.show(max_rows, truncate=False)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="hive-nexr-spark")
    ap.add_argument("-e", metavar="QUERY", help="run this query string and exit")
    ap.add_argument("-f", metavar="FILE", help="run statements from FILE and exit")
    ap.add_argument("--sf-dir", default=None,
                    help="testdata dir to register as views (default: "
                         "$SPARK_GRAFT_SF_DIR or /root/testdata/sf0.1)")
    ap.add_argument("--max-rows", type=int, default=100,
                    help="rows to display per result (default 100)")
    args = ap.parse_args(argv)

    from .hiveql import HiveQLSession
    from .io import DEFAULT_SF_DIR, register_views
    from .session import get_session

    spark = get_session(app_name="hive-nexr-spark-cli")
    register_views(spark, args.sf_dir or DEFAULT_SF_DIR)
    hql = HiveQLSession(spark)

    try:
        if args.e is not None:
            _process_line(hql, args.e, args.max_rows)
        elif args.f is not None:
            with open(args.f) as fh:
                _process_line(hql, fh.read(), args.max_rows)
        else:
            print("hive-nexr-spark CLI — ';'-terminated HiveQL, "
                  "'quit;' to exit")
            buf = ""
            while True:
                try:
                    prompt = "hql> " if not buf else "   > "
                    buf += input(prompt) + "\n"
                except EOFError:
                    break
                if ";" in buf:
                    try:
                        _process_line(hql, buf, args.max_rows)
                    except EOFError:
                        break
                    except Exception as exc:
                        print(f"error: {exc}", file=sys.stderr)
                    buf = ""
    except EOFError:
        pass
    except Exception as exc:
        print(f"error: {exc}", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
