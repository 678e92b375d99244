"""Server launcher: `python -m universql_spark [options]`.

The reference ships a click CLI that boots its proxy server
(`/root/reference/universql/main.py:23-49` — account/port/host options,
uvicorn + TLS). This is the same deployment surface for the Spark engine:
argparse (no extra deps), the flask protocol app, and the engine's tuned
SparkSession. Snowflake clients connect with
`account=local, host=<host>, port=<port>, protocol=http`.
"""

from __future__ import annotations

import argparse
import os


def main() -> None:
    p = argparse.ArgumentParser(
        prog="universql_spark",
        description="Snowflake-protocol server over the PySpark engine",
    )
    p.add_argument(
        "--port", type=int, default=int(os.environ.get("SERVER_PORT", "8084")),
        help="port for the Snowflake proxy server (default: 8084)",
    )
    p.add_argument(
        "--host", default=os.environ.get("SERVER_HOST", "127.0.0.1"),
        help="bind host (default: 127.0.0.1)",
    )
    p.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR"),
        help="parquet fixture dir to pre-register as tables (optional)",
    )
    p.add_argument(
        "--cpus", type=int, default=None,
        help="local[N] executor threads (default: all cores)",
    )
    p.add_argument(
        "--fallback", choices=["duckdb"], default=None,
        help="route SELECTs Spark cannot plan to the in-process DuckDB",
    )
    args = p.parse_args()

    from universql_spark.engine import Engine
    from universql_spark.protocol import create_app
    from universql_spark.session import get_spark

    spark = get_spark("universql_spark_server", cpus=args.cpus)
    eng = Engine(spark=spark, sf_dir=args.sf_dir, fallback=args.fallback)
    app = create_app(eng)
    print(f"universql_spark listening on http://{args.host}:{args.port} "
          f"(engine: Spark {spark.version}, local[{args.cpus or 'all'}])")
    app.run(host=args.host, port=args.port)


if __name__ == "__main__":
    main()
