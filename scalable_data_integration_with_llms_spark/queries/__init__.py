"""The engine's declared query surface (driver contract in __spark_entry__.py).

Each module registers queries with the shared registry; a query is a callable
``(spark, sf_dir) -> DataFrame`` plus (when SQL-expressible) a DuckDB oracle
SQL string producing the identical result — same column names, same values.

Import order defines nothing; every module is imported here so the registry is
complete after ``import ...queries``.
"""

from .registry import QUERIES, ORACLES, query  # noqa: F401

# Register all query modules.
from . import tpch  # noqa: F401, E402
from . import analytics  # noqa: F401, E402
from . import matching  # noqa: F401, E402
from . import metrics_q  # noqa: F401, E402
from . import dedup_q  # noqa: F401, E402
from . import text_q  # noqa: F401, E402
from . import similarity_q  # noqa: F401, E402
from . import streaming_q  # noqa: F401, E402
from . import mapping_q  # noqa: F401, E402
from . import reference_ops  # noqa: F401, E402
from . import er_q  # noqa: F401, E402
from . import approx_q  # noqa: F401, E402
from . import pipeline_q  # noqa: F401, E402
