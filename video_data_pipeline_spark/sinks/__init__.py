"""Sinks: WebDataset tar writer with rolling + manifest."""

from video_data_pipeline_spark.sinks.webdataset import write_webdataset  # noqa: F401
