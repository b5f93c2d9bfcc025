"""Event-table queries: time bucketing + SQL window functions.

The OGR dialect has no window functions (SURVEY §2.5 — no OVER in
swq_parser.y); its SQLITE dialect gets them from SQLite. In the new
engine these are stock Catalyst; included as first-class queries because
the window re-rank underpins kNN and first-match joins, and time
bucketing is the streaming rollup's batch twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from gdal_spark import tables


def _sql(spark: SparkSession, sf_dir: str, sql: str) -> DataFrame:
    tables.register_views(spark, sf_dir)
    return spark.sql(sql)


# tumbling 1-hour buckets per event type (shared text both engines)
EVENTS_BUCKET_SQL = """
    select date_trunc('hour', ts) as bucket, event_type,
           count(*) as n,
           round(sum(value), 4) as sum_value,
           round(avg(value), 6) as avg_value
    from events
    group by bucket, event_type
"""

# running per-user cumulative value + per-user event sequence number
EVENTS_WINDOW_SQL = """
    select event_id, user_id,
           row_number() over (partition by user_id order by ts, event_id)
             as seq,
           round(sum(value) over (partition by user_id order by ts, event_id
                                  rows between unbounded preceding
                                  and current row), 4) as running_value
    from events
    where user_id < 50
"""

# lag/lead deltas: inter-event gap seconds per user
EVENTS_GAP_SQL = """
    select event_id, user_id,
           cast(ts as timestamp) as ts,
           round(
             cast(epoch_us(ts) - epoch_us(lag(ts) over (
                 partition by user_id order by ts, event_id)) as double)
             / 1000000.0, 6) as gap_sec
    from events
    where user_id < 20
"""

# Spark side uses exact integer microseconds (unix_micros) so the
# division matches DuckDB's epoch_us bit-for-bit (double seconds would
# lose sub-microsecond precision at epoch magnitude).
EVENTS_GAP_SPARK = """
    select event_id, user_id,
           ts,
           round(
             cast(unix_micros(cast(ts as timestamp)) - unix_micros(lag(cast(ts as timestamp)) over (
                 partition by user_id order by ts, event_id)) as double)
             / 1000000.0, 6) as gap_sec
    from events
    where user_id < 20
"""


QUERIES = {
    "events_bucket_agg": lambda s, d: _sql(s, d, EVENTS_BUCKET_SQL),
    "events_window_running": lambda s, d: _sql(s, d, EVENTS_WINDOW_SQL),
    "events_lag_gap": lambda s, d: _sql(s, d, EVENTS_GAP_SPARK),
}

ORACLES = {
    "events_bucket_agg": EVENTS_BUCKET_SQL,
    "events_window_running": EVENTS_WINDOW_SQL,
    "events_lag_gap": EVENTS_GAP_SQL,
}
