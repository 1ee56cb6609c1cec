"""SQL-surface tests: the engine driven entirely through spark.sql."""

import pytest

from speech_data_pipeline_spark.sql.surface import register_sql_surface

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def sql_session(spark):
    register_sql_surface(spark, SF)
    return spark


def test_scalar_functions(sql_session):
    row = sql_session.sql(
        """
        SELECT overlap_len(0, 10, 5, 20) AS ov,
               trunc6(0.0640625) AS t6,
               clamp_pad(3, 5, 0, 100) AS cl,
               strip_audio_ext('Show.EP1.MP3') AS sid,
               speaker_label(3) AS spk,
               zero_pad5(42) AS zp
        """
    ).first()
    assert row.ov == 5
    assert row.t6 == 0.064062
    assert row.cl == 0
    assert row.sid == "Show.EP1"
    assert row.spk == "speaker_3"
    assert row.zp == "00042"


def test_views_and_interval_view(sql_session):
    n = sql_session.sql("SELECT count(*) AS n FROM intervals").first().n
    assert n == sql_session.sql("SELECT count(*) AS n FROM events").first().n
    ok = sql_session.sql(
        "SELECT count(*) AS n FROM intervals WHERE end_us <= start_us"
    ).first().n
    assert ok == 0 or ok < n  # durations positive except degenerate rows


def test_sessionize_tvf_matches_kernel(sql_session):
    got = sql_session.sql(
        """
        SELECT * FROM sessionize_capped(
            TABLE(intervals) PARTITION BY user_id ORDER BY (start_us, end_us),
            600000000, 1800000000)
        """
    )
    from speech_data_pipeline_spark.operators.sessions import sessionize_capped
    from speech_data_pipeline_spark.sources.catalog import derived_intervals

    want = sessionize_capped(
        derived_intervals(sql_session, SF),
        interval=600_000_000,
        max_duration=1_800_000_000,
    ).select("user_id", "session_id", "session_start", "session_end", "n_segments")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_sql_query_composes_functions_over_views(sql_session):
    out = sql_session.sql(
        """
        SELECT user_id,
               trunc6(avg(overlap_len(start_us, end_us, start_us, end_us)
                          / 1000000.0)) AS mean_dur_sec
        FROM intervals GROUP BY user_id
        """
    )
    rows = out.collect()
    assert rows and all(r.mean_dur_sec > 0 for r in rows)


def test_pack_sequences_tvf_matches_kernel(sql_session):
    from pyspark.sql import functions as F

    from speech_data_pipeline_spark.operators.packing import pack_sequences
    from speech_data_pipeline_spark.sources.catalog import load_table

    sql_session.sql(
        """
        CREATE OR REPLACE TEMPORARY VIEW doc_tokens AS
        SELECT source, doc_id,
               CAST(floor(n_chars / 4.0) AS BIGINT) + 1 AS n_tokens
        FROM documents
        """
    )
    got = sql_session.sql(
        """
        SELECT * FROM pack_sequences(
            TABLE(doc_tokens) PARTITION BY source ORDER BY (doc_id), 2048)
        """
    )
    d = load_table(sql_session, SF, "documents").select(
        "source",
        "doc_id",
        (F.floor(F.col("n_chars") / F.lit(4.0)).cast("long") + 1).alias("n_tokens"),
    )
    want = pack_sequences(d, budget=2048, key="source")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_split_bucket_function_matches_query(sql_session):
    got = sql_session.sql(
        "SELECT doc_id, split_bucket(doc_id) AS bucket FROM documents"
    )
    from speech_data_pipeline_spark.queries.curation_q import split_hash_buckets

    want = split_hash_buckets(sql_session, SF).select("doc_id", "bucket")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
