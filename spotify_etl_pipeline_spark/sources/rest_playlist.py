"""Custom Spark 4 Python DataSource: partitioned paginated playlist scan.

The reference's extraction is a sequential offset-pagination loop
(lambda/extraction/lambda_function.py:137-183). At cluster scale the same
scan becomes a *partitioned* read: one input partition per page range, each
executor fetching its own pages — this is the Spark-native version of "S1:
REST API paginated scan" (SURVEY.md §2.1).

Offline mode (this container has no network): the "API" is a directory of
page files ``page_00000.json`` (each holding {"items": [...]}) produced by
the extractor fixture — partition-per-page against local JSON exercises the
identical partition-planning/read machinery a live HTTP fetcher would use
(swap ``_read_page`` for a requests call; everything else is unchanged).

Usage::

    spark.dataSource.register(PlaylistPagesDataSource)
    df = (spark.read.format("playlist_pages")
          .option("path", pages_dir)
          .option("pages_per_partition", "4").load())
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

PAGE_GLOB_PREFIX = "page_"

SCHEMA = StructType(
    [
        StructField("page_no", IntegerType()),
        StructField("added_at", StringType()),
        StructField("track_id", StringType()),
        StructField("track_name", StringType()),
        StructField("album_id", StringType()),
        StructField("artist_id", StringType()),
    ]
)


class PageRange(InputPartition):
    def __init__(self, pages: Sequence[str]):
        self.pages = list(pages)


class PlaylistPagesReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("playlist_pages: 'path' option is required")
        self.pages_per_partition = int(options.get("pages_per_partition", "4"))

    def partitions(self) -> Sequence[PageRange]:
        files = sorted(
            f
            for f in os.listdir(self.path)
            if f.startswith(PAGE_GLOB_PREFIX) and f.endswith(".json")
        )
        n = self.pages_per_partition
        return [PageRange(files[i : i + n]) for i in range(0, len(files), n)]

    def read(self, partition: PageRange) -> Iterator[tuple]:
        for fname in partition.pages:
            page_no = int(fname[len(PAGE_GLOB_PREFIX) : -len(".json")])
            for item in self._read_page(os.path.join(self.path, fname)):
                track = item.get("track") or {}
                album = track.get("album") or {}
                artists = track.get("artists") or [{}]
                yield (
                    page_no,
                    item.get("added_at"),
                    track.get("id"),
                    track.get("name"),
                    album.get("id"),
                    (artists[0] or {}).get("id"),
                )

    @staticmethod
    def _read_page(path: str) -> list[dict]:
        # network boundary: a live source does an HTTP GET with
        # limit/offset here instead of a file read.
        with open(path, encoding="utf-8") as fh:
            return json.load(fh).get("items", [])


class PlaylistPagesDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "playlist_pages"

    def schema(self) -> StructType:
        return SCHEMA

    def reader(self, schema: StructType) -> PlaylistPagesReader:
        return PlaylistPagesReader(self.options)
