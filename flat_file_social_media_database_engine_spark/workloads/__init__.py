"""Workload registry: every implemented operator from SURVEY.md §2
instantiated on the driver fixtures, each with (where SQL-expressible)
a DuckDB oracle twin.

Submodules self-register via the ``@query`` decorator. Column names in
Spark results and oracle SQL are aliased identically — the driver's
compare sorts columns by name before hashing values.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a workload; ``oracle`` is the DuckDB-ANSI twin (omit
    for genuinely non-SQL-expressible ops → driver runs a weaker
    rows-only check)."""

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def load_all() -> None:
    from . import parity  # noqa: F401
    from . import analytics  # noqa: F401
    from . import text  # noqa: F401
    from . import dedup  # noqa: F401
    from . import similarity  # noqa: F401
    from . import eventflow  # noqa: F401
    from . import multimodal  # noqa: F401
