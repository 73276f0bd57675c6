"""Query registry backing the ``__spark_entry__`` driver contract.

Every operator the engine implements registers here as a ``QuerySpec``:
a Spark callable ``(spark, sf_dir) -> DataFrame`` plus (when the semantics
are SQL-expressible) the equivalent DuckDB SQL the driver runs as the
correctness oracle.  This mirrors the reference's test strategy — each
distributed op checked against a trusted local implementation
(SURVEY.md §5.1 [M]: ``test_scanpy_spark.py`` asserts against plain Scanpy)
— with DuckDB playing Scanpy's role.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None = None  # DuckDB SQL; None -> rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


#: name -> QuerySpec. Populated by the ``query`` decorator at import time.
REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Register a query implementation.

    ``oracle`` must alias every computed column to the same name the Spark
    DataFrame uses (driver hashes after sorting columns by name).
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, tags=tuple(tags), doc=(fn.__doc__ or "").strip()
        )
        return fn

    return deco


def _load_all_operator_modules() -> None:
    """Import every module that registers queries (idempotent)."""
    from .operators import (  # noqa: F401
        relational,
        advanced,
        asof,
        singlecell,
        dedup,
        similarity,
        textanalysis,
        multimodal,
        ml,
    )
    from .functions import scalar  # noqa: F401
    from .sources import chunkstore, sinks  # noqa: F401
    from .streaming import batch_equiv  # noqa: F401


def queries() -> dict[str, QueryFn]:
    _load_all_operator_modules()
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    _load_all_operator_modules()
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}
