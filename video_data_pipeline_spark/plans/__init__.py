"""The three reference pipelines as Spark plans: pack, tokenize, index."""

from video_data_pipeline_spark.plans.pack import pack_dataset  # noqa: F401
from video_data_pipeline_spark.plans.tokenize import tokenize_shards  # noqa: F401
from video_data_pipeline_spark.plans.index import index_shards  # noqa: F401
