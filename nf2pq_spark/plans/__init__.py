from .registry import REGISTRY, QuerySpec, oracle_sql, queries, register

# importing the plan modules populates REGISTRY
from . import relational  # noqa: E402,F401
from . import scalar_fns  # noqa: E402,F401
from . import timeseries  # noqa: E402,F401
from . import llm  # noqa: E402,F401
from . import udf_surface  # noqa: E402,F401
from . import streaming_q  # noqa: E402,F401
from . import collector  # noqa: E402,F401
from . import advanced  # noqa: E402,F401
from . import quality  # noqa: E402,F401
from . import modern  # noqa: E402,F401
from . import etl  # noqa: E402,F401

__all__ = ["REGISTRY", "QuerySpec", "register", "queries", "oracle_sql"]
