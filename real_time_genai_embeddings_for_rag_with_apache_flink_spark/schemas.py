"""Per-stage schemas (SURVEY.md section 1.4).

The reference moves records through raw JSON string -> CustomMessage POJO
(``KDS-P/.../pojo/CustomMessage.java:5-6``) -> untyped JSONObject
(``.../CustomMessageToJSONObject.java:28-37``) -> OpenSearch doc
``{passage_embedding, date, text}`` (``DataStreamJob.java:185-187``).
Here every stage has an analysis-time-checked StructType instead; the
missing-key behavior the reference leaves implicit (JSONException -> job
crash, ``DataStreamJob.java:146``) becomes explicit nulls from from_json.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    FloatType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# Wire format: one JSON string per record, exactly what the producer Lambda
# emits (kds-producer-lambda/lambda_function.py:16-19).
RAW_SCHEMA = StructType([StructField("value", StringType(), True)])

# Parsed message (reference stage M1, CustomMessageMapFunction.java:21-26).
MSG_SCHEMA = StructType(
    [
        StructField("text", StringType(), True),
        StructField("created_at", TimestampType(), True),
    ]
)

# Normalized document (reference stage M2 adds a generated _id,
# CustomMessageToJSONObject.java:25,30-34).
DOC_SCHEMA = StructType(
    [
        StructField("text", StringType(), True),
        StructField("created_at", TimestampType(), True),
        StructField("_id", StringType(), False),
    ]
)

# Embedded document (reference stage A1 output + sink projection,
# BedRockEmbeddingModelAsyncCustomMessage.java:99-106 /
# DataStreamJob.java:185-187). `error` carries the dead-letter reason the
# reference lacks (it emits null and would NPE its sink).
EMB_SCHEMA = StructType(
    [
        StructField("text", StringType(), True),
        StructField("created_at", TimestampType(), True),
        StructField("_id", StringType(), False),
        StructField("embedding", ArrayType(FloatType()), True),
        StructField("error", StringType(), True),
    ]
)

# Sink document: field names per the reference's OpenSearch emitter
# (createIndexRequest2, DataStreamJob.java:183-193).
SINK_SCHEMA = StructType(
    [
        StructField("passage_embedding", ArrayType(FloatType()), True),
        StructField("date", TimestampType(), True),
        StructField("text", StringType(), True),
    ]
)

# ISO-8601 with milliseconds + Z, as produced by
# kds-producer-lambda/lambda_function.py:13.
CREATED_AT_FORMAT = "yyyy-MM-dd'T'HH:mm:ss.SSSX"
