"""Compaction and range-clustered layout tests."""

from __future__ import annotations

from pathlib import Path

import duckdb
from pyspark.sql import functions as F

from spotify_etl_pipeline_spark.schemas import load_fixture
from spotify_etl_pipeline_spark.sources.maintenance import (
    compact,
    write_range_clustered,
)


def _parquet_files(path: str) -> list[Path]:
    return [p for p in Path(path).rglob("*.parquet") if p.is_file()]


def test_compact_reduces_file_count_preserves_rows(spark, sf_dir, tmp_path):
    src = str(tmp_path / "fragmented")
    out = str(tmp_path / "compacted")
    o = load_fixture(spark, sf_dir, "orders")
    o.repartition(64).write.parquet(src)  # simulate small-file ingest
    assert len(_parquet_files(src)) >= 64
    n_files = compact(spark, src, out, target_rows_per_file=10_000)
    assert len(_parquet_files(out)) == n_files < 10
    assert spark.read.parquet(out).count() == o.count()


def test_range_clustering_gives_skippable_file_stats(spark, sf_dir, tmp_path):
    """Each output file's min/max range on the cluster column must be
    near-disjoint — that's what lets parquet stats skip whole files."""
    out = str(tmp_path / "clustered")
    o = load_fixture(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    write_range_clustered(o, out, "o_orderkey", n_files=4)
    con = duckdb.connect()
    ranges = con.execute(
        f"""
        SELECT filename, MIN(o_orderkey) AS lo, MAX(o_orderkey) AS hi
        FROM read_parquet('{out}/*.parquet', filename=true)
        GROUP BY filename ORDER BY lo
        """
    ).fetchall()
    assert len(ranges) == 4
    for (_, _, prev_hi), (_, lo, _) in zip(ranges, ranges[1:]):
        assert lo > prev_hi  # disjoint ranges → file-level skipping works
