"""Custom Python DataSource: partitioned paginated playlist scan (S1)."""

from __future__ import annotations

from spotify_etl_pipeline_spark.sources.rest_playlist import PlaylistPagesDataSource

from . import spotify_fixtures as FX


def test_playlist_pages_datasource(spark, tmp_path):
    pages_dir = str(tmp_path / "pages")
    n_pages = FX.write_page_files(pages_dir, FX.RUN1_ITEMS + FX.RUN2_ITEMS, per_page=2)
    assert n_pages == 3

    spark.dataSource.register(PlaylistPagesDataSource)
    df = (
        spark.read.format("playlist_pages")
        .option("path", pages_dir)
        .option("pages_per_partition", "1")
        .load()
    )
    # one partition per page (pages_per_partition=1)
    assert df.rdd.getNumPartitions() == 3
    rows = df.collect()
    assert len(rows) == 5
    assert {r["track_id"] for r in rows} == {
        "trk_keep_000000000001",
        "trk_dup_0000000000001",
        "trk_nullpop_000000001",
        "trk_new_000000000001x",
    }
    assert {r["page_no"] for r in rows} == {0, 1, 2}
