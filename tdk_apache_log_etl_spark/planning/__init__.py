"""Planning-layer services above individual queries: materialized-view
rewrite (mv_rewrite.py).  Imported explicitly by callers — nothing here
registers driver-contract queries."""

from .mv_rewrite import (  # noqa: F401
    AggQuery,
    MaterializedView,
    answer,
    build_mv,
    try_rewrite,
)
