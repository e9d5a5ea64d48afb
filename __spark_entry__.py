"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  -> flagship tile-assignment + PIP join on sf0.001.
queries()     -> operator registry (SURVEY.md §2 coverage).
oracle_sql()  -> DuckDB-runnable ANSI SQL twins (same SQL text modulo
                 tiny dialect shims — see mapnik_vector_tile_spark.queries).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mapnik_vector_tile_spark import queries as Q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: cell assignment + per-tile counts + mercator bbox at
    z13 over sf0.001 orders (the reference's create_tile relation,
    src/vector_tile_processor.ipp:241-344, inverted into one shuffle)."""
    return Q.spark_query("tile_assign_z13")(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {
        name: Q.spark_query(name) for name in Q.SQL_QUERIES
    }
    out.update(_nonsql_queries())
    return out


def oracle_sql() -> dict[str, str]:
    out = {name: Q.oracle_sql_for(name) for name in Q.SQL_QUERIES}
    try:
        from mapnik_vector_tile_spark import nonsql_queries as NQ

        out.update(NQ.oracle_sql())
    except Exception:
        pass  # pipeline twins are additive; the SQL surface stands alone
    return out


def _nonsql_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Operators whose semantics aren't SQL-expressible (geometry
    kernels, pbf encode/decode, raster) — driver runs a rows-only check;
    full semantic goldens live in tests/."""
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    try:
        from mapnik_vector_tile_spark import nonsql_queries as NQ

        out.update(NQ.QUERIES)
    except Exception:
        pass
    return out
