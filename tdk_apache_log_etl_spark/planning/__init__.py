"""Planning-layer services above individual queries: materialized-view
rewrite (mv_rewrite.py) and the Selinger-style join-order advisor
(join_order.py).  Imported explicitly by callers — nothing here
registers driver-contract queries."""

from .mv_rewrite import (  # noqa: F401
    AggQuery,
    MaterializedView,
    answer,
    build_mv,
    rollup_frame,
    try_rewrite,
)

from .join_order import (  # noqa: F401,E402
    JoinPred,
    TableStats,
    best_left_deep,
    collect_table_stats,
    greedy_order,
)

from .lsh_tuning import (  # noqa: F401,E402
    BandingChoice,
    banding_threshold,
    candidate_prob,
    tune_bands,
)
