"""Schema normalization: declared + coercing + permissive (SURVEY §1.3).

The reference validates with a Pandera schema configured ``coerce=True`` per
column and ``strict=False`` (`core/data_validation.py:28-70`): strings are
cast to their declared types (junk -> NaN via ``errors='coerce'``,
`core/data_extraction.py:114-115`) and undeclared extra columns pass through
untouched (`core/data_validation.py:68`).

Spark mapping: an explicit cast per declared column (``cast`` yields NULL on
junk -- identical semantics to pandas coerce) while every extra column is
carried along unchanged. All casts are native Column expressions, so the
normalization stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Canonical hourly-readings schema (`core/data_validation.py:30-66`):
# period timestamp, respondent string, type string in {D,NG,TI,ID},
# value double >= 0.
READINGS_SCHEMA = T.StructType(
    [
        T.StructField("period", T.TimestampType(), nullable=False),
        T.StructField("respondent", T.StringType(), nullable=False),
        T.StructField("type", T.StringType(), nullable=True),
        T.StructField("value", T.DoubleType(), nullable=True),
    ]
)


def normalize(df: DataFrame, schema: T.StructType) -> DataFrame:
    """Cast declared columns to their target types, keep extras untouched.

    Missing declared columns become typed NULL columns (the validation layer
    then reports them), mirroring lazy Pandera collection
    (`core/data_validation.py:90`).
    """
    out = []
    declared = {f.name for f in schema.fields}
    for field in schema.fields:
        if field.name in df.columns:
            col = F.col(field.name)
            # try_* variants = pandas errors='coerce': NULL on junk. Plain
            # cast/to_timestamp would THROW under Spark 4's default ANSI mode.
            if isinstance(field.dataType, T.TimestampType):
                col = F.try_to_timestamp(col)
            else:
                col = col.try_cast(field.dataType)
            out.append(col.alias(field.name))
        else:
            out.append(F.lit(None).cast(field.dataType).alias(field.name))
    extras = [c for c in df.columns if c not in declared]
    return df.select(*out, *[F.col(c) for c in extras])


def normalize_readings(df: DataFrame) -> DataFrame:
    """Normalize a raw extract to the canonical readings schema
    (`core/data_extraction.py:111-118`: to_datetime + to_numeric + sort)."""
    return normalize(df, READINGS_SCHEMA)


# The driver `events` table is the stand-in for the electricity series
# (TESTDATA.md): ts ~ period, event_type ~ respondent (low-cardinality group
# key), value ~ value.
def events_as_readings(events: DataFrame) -> DataFrame:
    return events.select(
        F.col("ts").alias("period"),
        F.col("event_type").alias("respondent"),
        F.col("value").cast("double").alias("value"),
    )
