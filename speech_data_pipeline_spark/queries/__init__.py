from speech_data_pipeline_spark.queries.registry import (  # noqa: F401
    QUERIES,
    ORACLES,
    query,
)

# Importing the modules populates the registry.
from speech_data_pipeline_spark.queries import relational  # noqa: F401,E402
from speech_data_pipeline_spark.queries import intervals_q  # noqa: F401,E402
from speech_data_pipeline_spark.queries import text_q  # noqa: F401,E402
from speech_data_pipeline_spark.queries import extras_q  # noqa: F401,E402
from speech_data_pipeline_spark.queries import curation_q  # noqa: F401,E402
from speech_data_pipeline_spark.queries import corpus_q  # noqa: F401,E402
from speech_data_pipeline_spark.queries import mining_q  # noqa: F401,E402
from speech_data_pipeline_spark.queries import tpch_q  # noqa: F401,E402
from speech_data_pipeline_spark.queries import ml_q  # noqa: F401,E402
from speech_data_pipeline_spark.queries import selection_q  # noqa: F401,E402
from speech_data_pipeline_spark.queries import behavior_q  # noqa: F401,E402
from speech_data_pipeline_spark.queries import stats_q  # noqa: F401,E402
from speech_data_pipeline_spark.queries import market_q  # noqa: F401,E402
from speech_data_pipeline_spark.queries import eval_q  # noqa: F401,E402
from speech_data_pipeline_spark.queries import feature_q  # noqa: F401,E402
from speech_data_pipeline_spark.queries import privacy_q  # noqa: F401,E402
