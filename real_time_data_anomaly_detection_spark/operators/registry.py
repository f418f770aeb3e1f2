"""Query registry: named (Spark implementation, DuckDB oracle) pairs.

Determinism contract (SURVEY.md §2.2): every computed column is aliased
identically on both sides; every double aggregate/computed output is
rounded to 4 places on both sides; LIMIT queries carry a total order;
no rand()/now()/trig in hashed outputs.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    spark_fn: SparkQuery
    oracle: str | None  # ANSI SQL for DuckDB; None => rows-only check
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def query(name: str, oracle: str | None = None) -> Callable[[SparkQuery], SparkQuery]:
    """Decorator registering a (spark, sf_dir) -> DataFrame callable."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in REGISTRY:
            raise ValueError(f"duplicate query {name!r}")
        REGISTRY[name] = Query(name=name, spark_fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco
