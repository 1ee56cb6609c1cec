from speech_data_pipeline_spark.sql.surface import register_sql_surface  # noqa: F401
