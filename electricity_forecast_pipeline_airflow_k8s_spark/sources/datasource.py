"""Spark 4 Python DataSource for paginated REST APIs (SURVEY §2.1 S1,
scale-out path).

`spark.read.format("paged_rest")` with a registered
:class:`PagedRestDataSource` turns the reference's sequential driver loop
(`core/data_extraction.py:57-108`) into a first-class source: one input
partition per page, fetched on executors, composing with the rest of the
plan (pruning/filtering happen after fetch; the page split IS the
parallelism).

The fetch callable is resolved from a dotted path option
(``fetcher="pkg.module:function"``) so the source stays picklable and the
engine has no live-API dependency; tests use :func:`synthetic_fetcher`.
"""

from __future__ import annotations

import importlib
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType


def resolve_fetcher(path: str):
    """'pkg.module:function' -> callable(offset, length) -> list[dict]."""
    mod_name, fn_name = path.split(":", 1)
    return getattr(importlib.import_module(mod_name), fn_name)


def synthetic_fetcher(offset: int, length: int) -> list[dict]:
    """Deterministic fake EIA-like pages (hourly readings) for tests."""
    total = 2_160  # reference quick-test scale (README.md:592-594)
    end = min(offset + length, total)
    out = []
    for i in range(offset, end):
        # 10 respondents per hour slot, 24 hours per 240-row day ->
        # (period, respondent) pairs are unique across the whole feed
        out.append(
            {
                "period": f"2024-01-{i // 240 + 1:02d}T{(i % 240) // 10:02d}:00:00",
                "respondent": f"R{i % 10}",
                "type": "D",
                "value": float(1000 + (i % 240)),
            }
        )
    return out


class _PagePartition(InputPartition):
    def __init__(self, offset: int, length: int):
        self.offset = offset
        self.length = length


class PagedRestReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.schema_ = schema
        self.fetcher_path = options.get("fetcher")
        if not self.fetcher_path:
            raise ValueError("paged_rest requires option fetcher='module:function'")
        self.total = int(options.get("total", "0"))
        self.page_size = int(options.get("page_size", "5000"))

    def partitions(self) -> Sequence[InputPartition]:
        return [
            _PagePartition(off, self.page_size)
            for off in range(0, self.total, self.page_size)
        ]

    def read(self, partition: _PagePartition) -> Iterator[tuple]:
        fetcher = resolve_fetcher(self.fetcher_path)
        names = [f.name for f in self.schema_.fields]
        for rec in fetcher(partition.offset, partition.length):
            yield tuple(rec.get(n) for n in names)


class PagedRestStreamReader(SimpleDataSourceStreamReader):
    """Streaming variant: each micro-batch ingests the next page -- the
    incremental form of the reference's batch refetch window
    (`core/airflow_dag.py:100`: re-pull last 90 days weekly). Offsets are
    page offsets, so replay (readBetweenOffsets) is a deterministic
    re-fetch of the same page range."""

    def __init__(self, schema: StructType, options: dict):
        self.schema_ = schema
        self.fetcher_path = options.get("fetcher")
        if not self.fetcher_path:
            raise ValueError("paged_rest requires option fetcher='module:function'")
        self.page_size = int(options.get("page_size", "5000"))

    def initialOffset(self) -> dict:
        return {"offset": 0}

    def _rows(self, start: int, end: int | None) -> list[tuple]:
        fetcher = resolve_fetcher(self.fetcher_path)
        names = [f.name for f in self.schema_.fields]
        length = (end - start) if end is not None else self.page_size
        if length <= 0:
            return []
        records = fetcher(start, length)
        return [tuple(r.get(n) for n in names) for r in records]

    def read(self, start: dict):
        rows = self._rows(start["offset"], None)
        next_offset = {"offset": start["offset"] + len(rows)}
        return iter(rows), next_offset

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(self._rows(start["offset"], end["offset"]))


class PagedRestDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "paged_rest"

    def schema(self) -> str:
        return "period string, respondent string, type string, value double"

    def reader(self, schema: StructType) -> PagedRestReader:
        return PagedRestReader(schema, self.options)

    def simpleStreamReader(self, schema: StructType) -> PagedRestStreamReader:
        return PagedRestStreamReader(schema, self.options)
