"""Line-protocol query server — the service-surface analogue.

The reference exposes its engine over a Thrift service
(`service/src/java/org/apache/hadoop/hive/service/HiveServer.java:69`
HiveServerHandler.execute/fetchAll) with a JDBC driver on top
(`jdbc/src/java/org/apache/hadoop/hive/jdbc/HiveDriver.java:36`). The
Spark-first analogue of the wire protocol machinery is Spark Connect /
the Thrift JDBC server shipped with a full Spark distribution; in this
self-contained repo the same request/response surface is a thin
newline-delimited-JSON TCP protocol over
:class:`~hive_nexr_spark.hiveql.HiveQLSession`:

    request:  {"sql": "SELECT ..."}\\n
    response: {"columns": [...], "rows": [[...], ...], "rowcount": N,
               "truncated": false, "error": null}\\n

One SparkSession serves all connections (HiveServer is likewise a single
Hive session behind a service handler); statements execute serially per
connection, concurrency across connections comes from Spark's own
scheduler. Results are capped at `max_rows` per query (fetchAll's
paging collapsed to one page) — a server must never OOM the driver by
collecting an unbounded result.

Usage::

    python -m hive_nexr_spark.server [--port 10009] [--sf-dir DIR]
"""

from __future__ import annotations

import json
import socket
import socketserver
import threading


def _json_safe(v):
    if v is None or isinstance(v, (bool, int, float, str)):
        return v
    if isinstance(v, (list, tuple)):
        return [_json_safe(x) for x in v]
    if isinstance(v, dict):
        return {str(k): _json_safe(x) for k, x in v.items()}
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)  # timestamps, decimals, Rows → canonical string form


class HiveQLServer:
    """Serve HiveQL over newline-delimited JSON; one shared session."""

    def __init__(self, spark, host: str = "127.0.0.1", port: int = 0,
                 max_rows: int = 10000):
        from .hiveql import HiveQLSession

        self.hql = HiveQLSession(spark)
        self.max_rows = max_rows
        outer = self

        class Handler(socketserver.StreamRequestHandler):
            def handle(self):
                for raw in self.rfile:
                    line = raw.decode("utf-8", "replace").strip()
                    if not line:
                        continue
                    resp = outer._execute(line)
                    self.wfile.write(
                        (json.dumps(resp, default=str) + "\n").encode())
                    self.wfile.flush()

        class Server(socketserver.ThreadingTCPServer):
            allow_reuse_address = True
            daemon_threads = True

        self._server = Server((host, port), Handler)
        self.host, self.port = self._server.server_address
        self._thread: threading.Thread | None = None

    def _execute(self, line: str) -> dict:
        try:
            req = json.loads(line)
            sql = req["sql"]
        except Exception as exc:
            return {"columns": [], "rows": [], "rowcount": 0,
                    "truncated": False, "error": f"bad request: {exc}"}
        try:
            df = self.hql.sql(sql)
            if df is None:  # session command (ADD FILE, LOAD DATA, ...)
                return {"columns": [], "rows": [], "rowcount": 0,
                        "truncated": False, "error": None}
            taken = df.take(self.max_rows + 1)
            truncated = len(taken) > self.max_rows
            rows = [[_json_safe(v) for v in r] for r in taken[: self.max_rows]]
            return {"columns": list(df.columns), "rows": rows,
                    "rowcount": len(rows), "truncated": truncated,
                    "error": None}
        except Exception as exc:
            return {"columns": [], "rows": [], "rowcount": 0,
                    "truncated": False, "error": str(exc).split("\n", 1)[0]}

    def serve_background(self) -> tuple[str, int]:
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True)
        self._thread.start()
        return self.host, self.port

    def serve_forever(self) -> None:
        self._server.serve_forever()

    def shutdown(self) -> None:
        self._server.shutdown()
        self._server.server_close()


def query(host: str, port: int, sql: str, timeout: float = 60.0) -> dict:
    """Minimal client (the HiveDriver analogue): one request, one reply."""
    with socket.create_connection((host, port), timeout=timeout) as sock:
        sock.sendall((json.dumps({"sql": sql}) + "\n").encode())
        buf = b""
        while not buf.endswith(b"\n"):
            chunk = sock.recv(65536)
            if not chunk:
                # connection closed mid-response (handler died): a partial
                # buffer would json-decode to an opaque error — name the
                # real failure instead
                raise ConnectionError(
                    "server closed connection before a complete response "
                    f"({len(buf)} bytes buffered)")
            buf += chunk
    return json.loads(buf.decode())


def main(argv: list[str] | None = None) -> int:
    import argparse

    ap = argparse.ArgumentParser(prog="hive-nexr-spark-server")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=10009)
    ap.add_argument("--sf-dir", default=None)
    ap.add_argument("--max-rows", type=int, default=10000)
    args = ap.parse_args(argv)

    from .io import DEFAULT_SF_DIR, register_views
    from .session import get_session

    spark = get_session(app_name="hive-nexr-spark-server")
    register_views(spark, args.sf_dir or DEFAULT_SF_DIR)
    server = HiveQLServer(spark, host=args.host, port=args.port,
                          max_rows=args.max_rows)
    print(f"hive-nexr-spark server listening on {server.host}:{server.port}")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.shutdown()
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
