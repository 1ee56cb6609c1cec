from speech_data_pipeline_spark.ml import stubs  # noqa: F401
