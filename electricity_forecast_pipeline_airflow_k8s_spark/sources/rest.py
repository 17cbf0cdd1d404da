"""Parallel paginated-REST source (SURVEY §2.1 S1).

The reference fetches EIA pages sequentially in the driver process and
accumulates every record in RAM (`core/data_extraction.py:57-111` -- the
anti-pattern in SURVEY §4.2). Spark-first: pagination becomes a DataFrame
of page specs; ``mapInPandas`` fans the page fetches out across executors,
each yielding its page as an Arrow batch. The fetch callable is injected
(tests use a fake; production passes an HTTP client closure), so the
engine has no live-API dependency.

For Spark 4 clusters the same shape can be packaged as a Python
``DataSource``; the page-spec DataFrame form below needs only stock APIs.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

PageFetcher = Callable[[int, int], list[dict]]
"""(offset, length) -> list of record dicts for that page."""


def page_specs(
    spark: SparkSession, total: int, page_size: int = 5000, n_partitions: int | None = None
) -> DataFrame:
    """One row per page: (offset, length). page_size=5000 mirrors the EIA
    API max (`core/data_extraction.py:69`)."""
    specs = [(off, page_size) for off in range(0, total, page_size)]
    df = spark.createDataFrame(specs, "offset long, length long")
    # total=0 -> no pages; repartition(0) is illegal, so clamp to 1
    return df.repartition(n_partitions or max(1, min(len(specs), 64)))


def fetch_paginated(
    spark: SparkSession,
    fetcher: PageFetcher,
    total: int,
    schema: T.StructType,
    page_size: int = 5000,
) -> DataFrame:
    """Distributed paginated scan: each executor task fetches its pages and
    emits Arrow batches; downstream normalization (sources/normalize) casts
    to the canonical schema."""
    cols = [f.name for f in schema.fields]

    def fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for _, row in pdf.iterrows():
                records = fetcher(int(row["offset"]), int(row["length"]))
                if records:
                    yield pd.DataFrame.from_records(records)[cols]

    return page_specs(spark, total, page_size).mapInPandas(fetch, schema)
