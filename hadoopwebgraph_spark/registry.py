"""Central query registry backing ``__spark_entry__.py``.

Every operator from SURVEY.md §2 registers itself here with a PySpark
callable ``(spark, sf_dir) -> DataFrame`` and (when SQL-expressible) a
DuckDB oracle SQL string. The driver hashes both results order-insensitively
(sorted columns by name), so **every computed column is aliased identically
on both sides** and floating aggregates are rounded on both sides to make
the hash robust to summation-order ULP differences.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None -> rows-only check
    doc: str = ""


_REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: register a query callable under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = Query(name, fn, oracle, doc or (fn.__doc__ or ""))
        return fn

    return deco


def _load_all_modules() -> None:
    """Import every module that registers queries (idempotent)."""
    from .queries import relational  # noqa: F401
    from .queries import relational2  # noqa: F401
    from .queries import advanced  # noqa: F401
    from .queries import windows  # noqa: F401
    from .queries import setops_scalar  # noqa: F401
    from .queries import streaming_batch  # noqa: F401
    from .queries import graph  # noqa: F401
    from .queries import graph_algos  # noqa: F401
    from .functions import dedup  # noqa: F401
    from .functions import similarity  # noqa: F401
    from .functions import text  # noqa: F401
    from .functions import multimodal  # noqa: F401
    from .functions import grouped  # noqa: F401


def all_queries() -> dict[str, Query]:
    _load_all_modules()
    return dict(_REGISTRY)


def queries() -> dict[str, QueryFn]:
    return {name: q.fn for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in all_queries().items() if q.oracle is not None}
