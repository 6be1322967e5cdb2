"""Query registry: every implemented operator from SURVEY.md §2 is exposed
here as a (PySpark callable, DuckDB oracle SQL) pair for the driver's
correctness gate."""

from .registry import QUERIES, QueryDef, all_oracle_sql, all_queries, register

# Importing the modules populates the registry.
from . import core  # noqa: E402,F401
from . import relational  # noqa: E402,F401
from . import llm_text  # noqa: E402,F401
from . import dedup  # noqa: E402,F401
from . import similarity  # noqa: E402,F401
from . import multimodal  # noqa: E402,F401
from . import windows_extra  # noqa: E402,F401
from . import text_extra  # noqa: E402,F401
from . import joins_extra  # noqa: E402,F401
from . import relational_fns  # noqa: E402,F401
from . import pipeline_extra  # noqa: E402,F401
from . import training_extra  # noqa: E402,F401
from . import text_features  # noqa: E402,F401
from . import curation_extra  # noqa: E402,F401
from . import tpch_extra  # noqa: E402,F401
from . import corpus_stats  # noqa: E402,F401
from . import events_analytics  # noqa: E402,F401
from . import analysis_extra  # noqa: E402,F401
from . import sampling_quality  # noqa: E402,F401
from . import retrieval_eval  # noqa: E402,F401
from . import warehouse_extra  # noqa: E402,F401
from . import layout_extra  # noqa: E402,F401
from . import ml_linalg  # noqa: E402,F401
from . import dedup_eval  # noqa: E402,F401
from . import sketches  # noqa: E402,F401
from . import sql_surface  # noqa: E402,F401
from . import stats_extra  # noqa: E402,F401
from . import clustering  # noqa: E402,F401

__all__ = [
    "QUERIES",
    "QueryDef",
    "register",
    "all_queries",
    "all_oracle_sql",
]
