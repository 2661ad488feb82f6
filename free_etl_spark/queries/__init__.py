"""Import all query modules so their @query registrations run."""

from free_etl_spark.queries import (  # noqa: F401
    relational,
    tpch_more,
    complex_types,
    udfs,
    multimodal_q,
    sampling,
    quality,
    windows,
    setops,
    scalars,
    events,
    graph,
    text,
    dedup,
    similarity,
    sources_q,
)
from free_etl_spark.streaming import curation as streaming_curation  # noqa: F401
from free_etl_spark.streaming import joins as streaming_joins  # noqa: F401
from free_etl_spark.streaming import stateful as streaming_stateful  # noqa: F401
from free_etl_spark.streaming import windows as streaming_windows  # noqa: F401
from free_etl_spark.registry import ORACLES, QUERIES  # noqa: F401
