from sanctions_data_pipeline_spark.multimodal.ops import (  # noqa: F401
    DECODE_SCHEMA,
    attach_media,
    decode_features,
    resize_images,
    sample_frames,
)
