"""Declared-schema registry (schema-on-write, no inference).

The reference declares every schema up front — DDL strings for the 14
managed tables (``Setup/02-setup.py:23-259``) and literal schema
strings for each streaming source and JSON payload
(``Bronze/04-bronze.py:17,46,76``; ``Silver/05-silver.py:153-157,205,251``).
This module is the same contract as ``StructType`` values: every
source/sink in the engine takes its schema from here; nothing infers.

Two families:
- ``FITBIT_*`` — the reference's lakehouse workload (bronze feeds, JSON
  payload schemas, silver/gold tables).
- ``TESTDATA_*`` — the driver's TPC-H-ish benchmark tables
  (/root/testdata), used by the query catalog in ``plans``.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Fitbit workload: bronze feed schemas (reference Bronze/04-bronze.py)
# ---------------------------------------------------------------------------

# reference Bronze/04-bronze.py:17
REGISTERED_USERS = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("device_id", T.LongType()),
        T.StructField("mac_address", T.StringType()),
        T.StructField("registration_timestamp", T.DoubleType()),  # epoch s
    ]
)

# reference Bronze/04-bronze.py:46
GYM_LOGINS = T.StructType(
    [
        T.StructField("mac_address", T.StringType()),
        T.StructField("gym", T.LongType()),
        T.StructField("login", T.DoubleType()),  # epoch s
        T.StructField("logout", T.DoubleType()),  # epoch s
    ]
)

# Kafka record envelope — identical to the native Spark Kafka source
# columns (reference Bronze/04-bronze.py:76).
KAFKA_ENVELOPE = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("value", T.StringType()),  # JSON payload, parsed late
        T.StructField("topic", T.StringType()),
        T.StructField("partition", T.LongType()),
        T.StructField("offset", T.LongType()),
        T.StructField("timestamp", T.LongType()),  # epoch ms
    ]
)

# Topic payloads, parsed with from_json (schema-on-read over the
# multiplexed bronze table).
# reference Silver/05-silver.py:153-157 (nested address struct)
USER_INFO_PAYLOAD = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("update_type", T.StringType()),  # new|update|delete
        T.StructField("timestamp", T.DoubleType()),  # epoch s
        T.StructField("dob", T.StringType()),  # 'MM/dd/yyyy'
        T.StructField("sex", T.StringType()),
        T.StructField("gender", T.StringType()),
        T.StructField("first_name", T.StringType()),
        T.StructField("last_name", T.StringType()),
        T.StructField(
            "address",
            T.StructType(
                [
                    T.StructField("street_address", T.StringType()),
                    T.StructField("city", T.StringType()),
                    T.StructField("state", T.StringType()),
                    T.StructField("zip", T.IntegerType()),
                ]
            ),
        ),
    ]
)

# reference Silver/05-silver.py:205
WORKOUT_PAYLOAD = T.StructType(
    [
        T.StructField("user_id", T.IntegerType()),
        T.StructField("workout_id", T.IntegerType()),
        T.StructField("timestamp", T.DoubleType()),  # epoch s
        T.StructField("action", T.StringType()),  # start|stop
        T.StructField("session_id", T.IntegerType()),
    ]
)

# reference Silver/05-silver.py:251
BPM_PAYLOAD = T.StructType(
    [
        T.StructField("device_id", T.LongType()),
        T.StructField("time", T.DoubleType()),  # epoch s, cast in silver
        T.StructField("heartrate", T.DoubleType()),
    ]
)

# reference Setup/02-setup.py:205-214
DATE_LOOKUP = T.StructType(
    [
        T.StructField("date", T.DateType()),
        T.StructField("week", T.IntegerType()),
        T.StructField("year", T.IntegerType()),
        T.StructField("month", T.IntegerType()),
        T.StructField("dayofweek", T.IntegerType()),
        T.StructField("dayofmonth", T.IntegerType()),
        T.StructField("dayofyear", T.IntegerType()),
        T.StructField("week_part", T.StringType()),
    ]
)

FITBIT_SCHEMAS: dict[str, T.StructType] = {
    "registered_users": REGISTERED_USERS,
    "gym_logins": GYM_LOGINS,
    "kafka_multiplex": KAFKA_ENVELOPE,
    "user_info": USER_INFO_PAYLOAD,
    "workout": WORKOUT_PAYLOAD,
    "bpm": BPM_PAYLOAD,
    "date_lookup": DATE_LOOKUP,
}

# ---------------------------------------------------------------------------
# Driver testdata tables (TESTDATA.md)
# ---------------------------------------------------------------------------

TESTDATA_SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampType()),
        ]
    ),
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}
