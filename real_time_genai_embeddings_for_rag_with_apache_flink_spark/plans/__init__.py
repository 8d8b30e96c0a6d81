from .registry import QuerySpec, all_specs, get_spec, query

# Importing these modules populates the registry.
from . import catalog  # noqa: E402,F401
from . import tpch_extra  # noqa: E402,F401
from . import llmops  # noqa: E402,F401
from . import pipeline_extra  # noqa: E402,F401
from . import windows  # noqa: E402,F401
from . import streaming_queries  # noqa: E402,F401
from . import udfs  # noqa: E402,F401
from . import reshape  # noqa: E402,F401
from . import subqueries  # noqa: E402,F401

__all__ = ["QuerySpec", "all_specs", "get_spec", "query"]
