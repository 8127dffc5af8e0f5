"""Golden ETL tests (SURVEY.md §5.2/§5.3): extractor → bronze → normalize →
gold star schema → reference analytics, with every FIXTURES.md §B1 edge case
asserted: cross-run dedup, NULL handling, partial dates, multi-artist
explode, referential integrity, incremental upsert."""

from __future__ import annotations

import datetime as dt
import json
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from spotify_etl_pipeline_spark.etl.incremental import insert_only, upsert
from spotify_etl_pipeline_spark.etl.normalize import normalize_documents, read_bronze
from spotify_etl_pipeline_spark.etl.star import (
    build_gold,
    reference_analytics,
    write_gold,
)
from spotify_etl_pipeline_spark.etl.validate import validate_star
from spotify_etl_pipeline_spark.sources.ingest import (
    InvalidPlaylistUrlError,
    PlaylistExtractor,
    extract_playlist_id,
    handler_response,
)

from . import spotify_fixtures as FX


@pytest.fixture(scope="module")
def bronze_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("bronze"))
    FX.write_bronze_fixture(root)
    return root


@pytest.fixture(scope="module")
def silver(spark, bronze_root):
    bronze = read_bronze(spark, f"{bronze_root}/raw_data/to_processed/*.json")
    return normalize_documents(bronze)


@pytest.fixture(scope="module")
def gold(silver):
    t = F.to_timestamp(F.lit("2024-03-02 03:00:00"))
    ld = F.to_timestamp(F.lit("2024-03-02 03:05:00"))
    return build_gold(silver, transformed_at=t, loaded_at=ld)


def test_extractor_writes_stage_routed_doc(bronze_root):
    files = sorted(Path(bronze_root, "raw_data", "to_processed").glob("*.json"))
    assert [f.name for f in files] == [
        f"playlist_{FX.PLAYLIST_ID}_20240301_020000.json",
        f"playlist_{FX.PLAYLIST_ID}_20240302_020000.json",
    ]
    doc = json.loads(files[0].read_text())
    assert doc["playlist_id"] == FX.PLAYLIST_ID
    assert doc["total_tracks"] == 3
    assert doc["extracted_at"] == doc["extraction_timestamp"]
    logs = list(Path(bronze_root, "logs", "execution_logs").glob("*.json"))
    assert len(logs) == 2


def test_extractor_rejects_bad_urls(tmp_path):
    ex = PlaylistExtractor(bronze_root=str(tmp_path))
    for bad in ["", "https://example.com/x", "https://open.spotify.com/playlist/short"]:
        with pytest.raises(InvalidPlaylistUrlError):
            ex.extract(bad)
    # error sink got a dead-letter file for the well-formed-but-failing case
    assert extract_playlist_id(FX.PLAYLIST_URL) == FX.PLAYLIST_ID


def test_handler_response_status_mapping():
    """Reference lambda_function.py:372-401 contract: 200 success with
    data payload, 400 ETL_ERROR for domain failures, 500 INTERNAL_ERROR
    with the message withheld for unexpected ones."""
    ok = handler_response(lambda: {"rows": 3})
    assert ok["statusCode"] == 200
    assert json.loads(ok["body"])["data"] == {"rows": 3}

    def bad_url():
        raise InvalidPlaylistUrlError("not a playlist URL")

    bad = handler_response(bad_url)
    assert bad["statusCode"] == 400
    assert json.loads(bad["body"]) == {
        "error": "ETL_ERROR",
        "message": "not a playlist URL",
    }

    def boom():
        raise RuntimeError("secret internal detail")

    err = handler_response(boom)
    assert err["statusCode"] == 500
    assert "secret" not in err["body"]
    assert json.loads(err["body"])["error"] == "INTERNAL_ERROR"


def test_normalize_latest_wins_dedup(silver):
    songs = {r["song_id"]: r for r in silver["songs"].collect()}
    # 4 distinct songs from 5 track rows (dup id collapsed)
    assert len(songs) == 4
    dup = songs["trk_dup_0000000000001"]
    assert dup["song_name"] == "Dup v2"  # run2 wins
    assert dup["popularity"] == 55
    assert dup["artist_id"] == "art_duo_a_00000000001"  # primary artist


def test_normalize_null_handling(silver):
    nullpop = silver["songs"].filter(F.col("song_id") == "trk_nullpop_000000001").first()
    assert nullpop["popularity"] is None  # attribute NULL preserved
    year_album = silver["albums"].filter(F.col("album_id") == "alb_year_only_00000001").first()
    assert year_album["label"] is None


def test_partial_date_parsing(silver):
    parsed = {
        r["album_id"]: r["release_date_parsed"]
        for r in silver["albums"].collect()
    }
    assert parsed["alb_full_date_000000001"] == dt.date(2020, 5, 17)
    assert parsed["alb_year_month_0000001"] == dt.date(2019, 11, 1)
    assert parsed["alb_year_only_00000001"] == dt.date(1998, 1, 1)


def test_multi_artist_explode(silver):
    artists = {r["artist_id"] for r in silver["artists"].collect()}
    assert artists == {
        "art_solo_000000000001",
        "art_duo_a_00000000001",
        "art_duo_b_00000000001",
    }


def test_gold_star_schema_and_validation(gold):
    checks = validate_star(gold)
    for name, df in checks.items():
        assert df.count() == 0, f"validation {name} found violations"
    assert gold["tblSongs"].filter(F.col("loaded_at").isNull()).count() == 0


def test_referential_violation_detected(spark, gold):
    from spotify_etl_pipeline_spark.etl.validate import referential_violations

    orphan = spark.createDataFrame(
        [("song_x", "alb_missing_000000001")], "song_id string, album_id string"
    )
    bad = gold["tblSongs"].select("song_id", "album_id").unionByName(orphan)
    v = referential_violations(bad, gold["tblAlbum"], "album_id", "album_id")
    assert [r["song_id"] for r in v.collect()] == ["song_x"]


def test_reference_analytics_queries(gold):
    out = reference_analytics(gold)
    health = {r["table_name"]: r["row_count"] for r in out["health_rowcounts"].collect()}
    assert health == {"tblSongs": 4, "tblArtist": 3, "tblAlbum": 4}
    assert out["freshness"].first()["latest_load"] == "2024-03-02 03:05:00"
    top = out["top10_songs"].collect()
    assert top[0]["song_name"] == "Keeper" and top[0]["popularity"] == 80
    dist = {r["album_type"]: r["pct"] for r in out["album_type_distribution"].collect()}
    assert dist == {"album": 75.0, "single": 25.0}
    assert out["avg_latency"].first()["avg_latency_min"] is not None


def test_incremental_insert_only_and_upsert(spark, silver):
    existing = silver["songs"].filter(F.col("song_id") != "trk_new_000000000001x")
    increment = silver["songs"]
    new_rows = insert_only(increment, existing, "song_id")
    assert [r["song_id"] for r in new_rows.collect()] == ["trk_new_000000000001x"]

    # upsert: bump one song's extracted_at + popularity; merged keeps 4 rows
    bumped = increment.withColumn(
        "extracted_at",
        F.when(
            F.col("song_id") == "trk_keep_000000000001",
            F.to_timestamp(F.lit("2024-03-05 00:00:00")),
        ).otherwise(F.col("extracted_at")),
    ).withColumn(
        "popularity",
        F.when(F.col("song_id") == "trk_keep_000000000001", F.lit(99)).otherwise(
            F.col("popularity")
        ),
    )
    merged = upsert(bumped, existing, "song_id")
    assert merged.count() == 4
    assert (
        merged.filter(F.col("song_id") == "trk_keep_000000000001").first()["popularity"]
        == 99
    )


def test_write_gold_with_csv_parity(spark, gold, tmp_path):
    root = str(tmp_path / "gold")
    write_gold(gold, root, csv_parity=True)
    back = spark.read.parquet(f"{root}/tblSongs")
    assert back.count() == 4
    csv = spark.read.option("header", True).csv(
        f"{root}/transformed_data/song_data"
    )
    assert csv.count() == 4 and "song_id" in csv.columns


def test_write_gold_orc_round_trip(spark, gold, tmp_path):
    """ORC sink parity: same plan, one-word format dial; the read-back
    rows must equal the parquet sink's exactly (schema included)."""
    import pytest as _p

    proot = str(tmp_path / "gold_pq")
    oroot = str(tmp_path / "gold_orc")
    write_gold(gold, proot)
    write_gold(gold, oroot, fmt="orc")
    for name in gold:
        pq = spark.read.parquet(f"{proot}/{name}")
        orc = spark.read.orc(f"{oroot}/{name}")
        assert orc.schema == pq.schema
        assert orc.exceptAll(pq).count() == 0
        assert pq.exceptAll(orc).count() == 0
    with _p.raises(ValueError):
        write_gold(gold, str(tmp_path / "bad"), fmt="avro")


def test_scd2_tracks_history(spark):
    """Type-2 SCD: changed attrs close the old row and open a new current
    one; unchanged keys pass through; new keys just appear."""
    from datetime import datetime

    from spotify_etl_pipeline_spark.etl.incremental import scd2_apply

    t0, t1 = datetime(2024, 1, 1), datetime(2024, 2, 1)
    existing = spark.createDataFrame(
        [
            ("a1", "Old Label", t0, None, True),
            ("a2", "Same Label", t0, None, True),
        ],
        "album_id string, label string, effective_from timestamp, "
        "effective_to timestamp, is_current boolean",
    )
    snapshot = spark.createDataFrame(
        [
            ("a1", "New Label", t1),   # changed → close + reopen
            ("a2", "Same Label", t1),  # unchanged → untouched
            ("a3", "Brand New", t1),   # new key → insert
        ],
        "album_id string, label string, extracted_at timestamp",
    )
    out = scd2_apply(existing, snapshot, pk="album_id", attrs=["label"])
    rows = {
        (r["album_id"], r["label"], r["is_current"]): r for r in out.collect()
    }
    assert len(rows) == 4
    closed = rows[("a1", "Old Label", False)]
    assert closed["effective_to"] == t1
    assert rows[("a1", "New Label", True)]["effective_from"] == t1
    assert rows[("a2", "Same Label", True)]["effective_from"] == t0
    assert rows[("a3", "Brand New", True)]["effective_from"] == t1


def test_scd2_collapses_multi_snapshot_increment(spark):
    """Two snapshots of the same key in one batch: only the latest applies,
    and exactly one current row results."""
    from datetime import datetime

    from spotify_etl_pipeline_spark.etl.incremental import scd2_apply

    t0, t1, t2 = (
        datetime(2024, 1, 1),
        datetime(2024, 2, 1),
        datetime(2024, 3, 1),
    )
    existing = spark.createDataFrame(
        [("a1", "V0", t0, None, True)],
        "album_id string, label string, effective_from timestamp, "
        "effective_to timestamp, is_current boolean",
    )
    batch = spark.createDataFrame(
        [("a1", "V1", t1), ("a1", "V2", t2)],
        "album_id string, label string, extracted_at timestamp",
    )
    out = scd2_apply(existing, batch, pk="album_id", attrs=["label"]).collect()
    current = [r for r in out if r["is_current"]]
    assert len(current) == 1 and current[0]["label"] == "V2"
    assert current[0]["effective_from"] == t2
    closed = [r for r in out if not r["is_current"]]
    assert len(closed) == 1 and closed[0]["effective_to"] == t2


def test_observation_captures_metrics_in_flight(spark, sf_dir):
    """Observation metrics ride along with the consuming action — a
    monitoring scan costs zero extra jobs."""
    from spotify_etl_pipeline_spark.etl.logs import observed
    from spotify_etl_pipeline_spark.schemas import load_fixture

    o = load_fixture(spark, sf_dir, "orders").filter("o_totalprice > 100000")
    df, obs = observed(o, "run_metrics")
    written = df.count()  # the action that also evaluates the observation
    assert obs.get["n_rows"] == written > 0
