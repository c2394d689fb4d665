"""The named query inventory (SURVEY.md §2) and its DuckDB oracle twins.

Importing this package populates :data:`QUERIES` / :data:`ORACLES`
(see ``registry``). ``__spark_entry__.py`` re-exports them to the
correctness driver.
"""

from .registry import ORACLES, QUERIES, register  # noqa: F401

# Import for side effects: each module registers its queries.
from . import relational  # noqa: E402,F401
from . import scalar_funcs  # noqa: E402,F401
from . import udfs  # noqa: E402,F401
from . import tier_c  # noqa: E402,F401
from . import merge_q  # noqa: E402,F401
from . import weather_q  # noqa: E402,F401
from . import streaming_q  # noqa: E402,F401
