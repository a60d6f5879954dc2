from map_reduce_lite_spark.ops.dedup import DEDUP_QUERIES  # noqa: F401
from map_reduce_lite_spark.ops.similarity import SIMILARITY_QUERIES  # noqa: F401
from map_reduce_lite_spark.ops.text import TEXT_QUERIES  # noqa: F401
from map_reduce_lite_spark.ops.multimodal import MULTIMODAL_QUERIES  # noqa: F401
from map_reduce_lite_spark.ops.curation import CURATION_QUERIES  # noqa: F401
from map_reduce_lite_spark.ops.pipeline import PIPELINE_QUERIES  # noqa: F401
from map_reduce_lite_spark.ops.sampling import SAMPLING_QUERIES  # noqa: F401
