from nem_mms_spark.streaming.incremental import incremental_encode  # noqa: F401
