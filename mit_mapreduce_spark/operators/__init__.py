"""Query operators. Each module registers (query, oracle) pairs into
the shared registry via the @query decorator; ``__spark_entry__.py``
exposes the aggregate to the driver."""

from mit_mapreduce_spark.operators.registry import QUERIES, ORACLES, query  # noqa: F401


def load_all() -> None:
    """Import every operator module so its @query registrations run."""
    from mit_mapreduce_spark.operators import (  # noqa: F401
        text,
        relational,
        analytics,
        decision,
        windows,
        events,
        dedup,
        linkage,
        similarity,
        textstats,
        curation,
        sketches,
        temporal,
        multimodal,
        mmdedup,
        mmquality,
        profiling,
        udfs,
        mrparity,
        streaming_queries,
    )
