"""Dataflow operators re-expressed as DataFrame → DataFrame transforms.

Reference operators live in ``webdataset-private/webdataset/filters.py`` et
al. as one-row-at-a-time generator stages; here each is a declarative
transform Catalyst can optimize (pushdown, pruning, codegen). Compose with
``df.transform(op(...))``.
"""

from video_data_pipeline_spark.operators.projection import (  # noqa: F401
    extract_keys,
    rename,
    to_tuple,
)
from video_data_pipeline_spark.operators.sampling import (  # noqa: F401
    detshuffle,
    rsample,
    sliced,
    uniform_sample_positions,
)
from video_data_pipeline_spark.operators.mixing import random_mix, round_robin  # noqa: F401
from video_data_pipeline_spark.operators.maps import map_with_policy  # noqa: F401
from video_data_pipeline_spark.operators.join import associate, combine_keyframes  # noqa: F401
from video_data_pipeline_spark.operators.batching import batched, unbatched  # noqa: F401
from video_data_pipeline_spark.operators.packing import greedy_bin_pack  # noqa: F401
