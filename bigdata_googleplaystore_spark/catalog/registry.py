"""Query registry: the driver-facing inventory.

Every operator from SURVEY.md §2 (plus the LLM-pipeline extensions) is
registered here as a named query: a PySpark callable ``(spark, sf_dir) ->
DataFrame`` and, where the semantics are ANSI-SQL-expressible, a DuckDB
oracle SQL string over the same parquet tables. ``__spark_entry__.py``
exposes this registry verbatim.

Determinism contract (the driver hashes values order-insensitively but
exactly):
- every computed column is aliased identically in Spark and SQL;
- floating aggregates are rounded (sums -> 2dp, avgs/ratios -> 6dp,
  similarities -> 4dp) in BOTH engines so accumulation-order noise can't
  flip a hash;
- arrays are sorted before comparison; top-k uses total tiebreak orders.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QueryDef:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, or None -> driver does rows-only check
    tags: tuple[str, ...] = ()
    doc: str = ""


QUERIES: dict[str, QueryDef] = {}


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: register a query under ``name`` with its oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = QueryDef(name, fn, oracle, tags, (fn.__doc__ or "").strip())
        return fn

    return deco
