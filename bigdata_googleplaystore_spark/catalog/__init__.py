"""Query catalog: importing this package populates the registry."""

from __future__ import annotations

from .registry import QUERIES, QueryDef, register  # noqa: F401

# Populate the registry. Each module registers its queries at import time.
from . import llm, ops, tpch  # noqa: E402,F401

from .tpch import flagship  # noqa: E402,F401


def spark_queries():
    """name -> (spark, sf_dir) -> DataFrame, for __spark_entry__.queries()."""
    return {name: qd.fn for name, qd in QUERIES.items()}


def oracle_sqls():
    """name -> DuckDB SQL, for __spark_entry__.oracle_sql(); rows-only
    queries (no SQL-expressible oracle) are omitted per the driver contract."""
    return {name: qd.oracle for name, qd in QUERIES.items() if qd.oracle}
