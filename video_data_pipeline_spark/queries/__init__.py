"""Query registry package. ``load_all()`` populates the registry."""

from video_data_pipeline_spark.queries.registry import REGISTRY, Query, load_all, query, table  # noqa: F401
