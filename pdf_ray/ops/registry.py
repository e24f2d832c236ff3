"""Registry of table-level data-processing queries (dedup, similarity,
text analysis, relational) over the sf* testdata tables. Populated by the
ops modules; each entry pairs a Ray Data pipeline with DuckDB oracle SQL
(omitted only for non-SQL-expressible ops -> rows-only driver check)."""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

QUERIES: dict[str, Callable[[str], Any]] = {}
ORACLE_SQL: dict[str, str] = {}


def register(name: str, fn: Callable[[str], Any], sql: str | None = None):
    QUERIES[name] = fn
    if sql is not None:
        ORACLE_SQL[name] = sql
    return fn


def _load_all():
    from . import (  # noqa: F401
        cluster,
        dedup,
        relational,
        simsearch,
        sketches,
        substring,
        textstats,
    )


_load_all()
