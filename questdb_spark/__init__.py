"""questdb_spark — a PySpark-native time-series analytics engine with the
query and data-processing capabilities of QuestDB (see SURVEY.md), plus
training-data pipeline operators (dedup, similarity, text analysis).

Public API:

    from questdb_spark import get_session, QdbEngine, TimeTable
    from questdb_spark.operators import asof_join, sample_by, latest_on
"""

from .session import get_session
from .sqlfront.engine import QdbEngine
from .table import TimeTable

__all__ = ["get_session", "QdbEngine", "TimeTable"]
