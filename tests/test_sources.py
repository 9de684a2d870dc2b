"""Ingestion-layer schema hardening.

The driver regenerates the parquet fixtures between rounds and has
already shipped the ``events.ts`` column three ways — TIMESTAMP(NANOS)
(read as bigint under ``nanosAsLong``), tz-naive ``timestamp[us]``
(Spark 4 reads TIMESTAMP_NTZ), and tz-aware ``timestamp[us]``.  These
tests write one parquet file per encoding and push it through every
event-time consumer, so a future fixture regeneration cannot silently
break sessionize / watermarks / temporal joins again (round-4 bench
crash: BENCH_r04.json rc=1 on the NTZ fixture).
"""

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from networkframe_spark.functions.temporal import (
    asof_join,
    funnel_counts,
    inter_event_stats,
    range_join,
)
from networkframe_spark.sources import normalize_event_time
from networkframe_spark.streaming.ops import (
    session_stats,
    session_window_stats,
    sessionize,
    windowed_event_counts,
)
from networkframe_spark.streaming.stream import (
    stream_deduplicate,
    stream_unique_users,
)

BASE = datetime.datetime(2024, 1, 1, 0, 0, 0)
ROWS = [
    # (event_id, user_id, event_type, ts_offset_s, value)
    (1, 1, "click", 0, 1.0),
    (2, 1, "click", 600, 2.0),
    (3, 1, "buy", 7200, 3.0),  # > 30 min gap: second session
    (4, 2, "click", 30, 4.0),
    (5, 2, "error", 90, 5.0),
]


def _write_events(tmp_path, flavor: str) -> str:
    ts = [BASE + datetime.timedelta(seconds=o) for (_, _, _, o, _) in ROWS]
    if flavor == "ntz":
        ts_arr = pa.array(ts, type=pa.timestamp("us"))
    elif flavor == "utc":
        ts_arr = pa.array(ts, type=pa.timestamp("us", tz="UTC"))
    elif flavor == "nanos":
        ts_arr = pa.array(
            [int(t.timestamp() * 1e9) for t in ts], type=pa.int64()
        )
    else:
        raise ValueError(flavor)
    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in ROWS], pa.int64()),
            "user_id": pa.array([r[1] for r in ROWS], pa.int64()),
            "event_type": pa.array([r[2] for r in ROWS], pa.string()),
            "ts": ts_arr,
            "value": pa.array([r[4] for r in ROWS], pa.float64()),
        }
    )
    path = str(tmp_path / f"events_{flavor}")
    pq.write_table(table, path + ".parquet")
    return path + ".parquet"


def _read(spark, path, flavor):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(path)
    if flavor == "nanos":
        # fixture encoding #1: epoch nanos stored as int64
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


FLAVORS = ["ntz", "utc"]


@pytest.mark.parametrize("flavor", FLAVORS + ["nanos"])
def test_normalize_event_time_yields_timestamp(spark, tmp_path, flavor):
    raw = spark.read.parquet(_write_events(tmp_path, flavor))
    if flavor == "nanos":
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    out = normalize_event_time(raw, "ts")
    assert dict(out.dtypes)["ts"] == "timestamp"
    got = sorted(r["ts"] for r in out.select("ts").collect())
    assert got[0] == BASE and got[-1] == BASE + datetime.timedelta(seconds=7200)


def test_normalize_event_time_noop_without_column(spark):
    df = spark.range(3)
    assert normalize_event_time(df, "ts") is df or "ts" not in df.columns


@pytest.mark.parametrize("flavor", FLAVORS)
def test_sessionize_family_all_encodings(spark, tmp_path, flavor):
    ev = _read(spark, _write_events(tmp_path, flavor), flavor)
    sess = {
        (r["user_id"], r["event_id"]): r["session_id"]
        for r in sessionize(ev).collect()
    }
    assert sess[(1, 1)] == 1 and sess[(1, 2)] == 1 and sess[(1, 3)] == 2
    assert sess[(2, 4)] == 1 and sess[(2, 5)] == 1

    stats = {
        (r["user_id"], r["session_id"]): r for r in session_stats(ev).collect()
    }
    assert stats[(1, 1)]["n_events"] == 2
    assert stats[(1, 1)]["duration_s"] == 600
    assert stats[(2, 1)]["sum_value"] == 9.0

    # native session_window + tumbling window both accept either flavor
    assert session_window_stats(ev).count() == 3
    assert windowed_event_counts(ev, "1 hour").count() > 0


@pytest.mark.parametrize("flavor", FLAVORS)
def test_temporal_joins_all_encodings(spark, tmp_path, flavor):
    ev = _read(spark, _write_events(tmp_path, flavor), flavor)
    clicks = ev.filter("event_type = 'click'")
    other = ev.filter("event_type != 'click'")
    a = asof_join(other, clicks, on="user_id", tolerance_seconds=10**6)
    assert a.count() == other.count()
    r = range_join(
        clicks.select("user_id", "ts", "event_id"),
        other.select("user_id", "ts", "event_id"),
        on="user_id",
        window_seconds=7200,
    )
    assert r.count() >= 1
    assert inter_event_stats(ev).count() == 2
    fc = funnel_counts(ev, "click", "buy", within_minutes=600).collect()[0]
    assert fc["n_step1_users"] == 2 and fc["n_converted"] == 1


@pytest.mark.parametrize("flavor", FLAVORS)
def test_watermark_ops_all_encodings(spark, tmp_path, flavor):
    """withWatermark is the op that hard-fails on TIMESTAMP_NTZ; the
    batch twins of the streaming helpers must normalize first."""
    ev = _read(spark, _write_events(tmp_path, flavor), flavor)
    # batch execution of the streaming plan builders: analysis is where
    # the NTZ type error fires, so .count() proves the plan is legal
    assert stream_unique_users(ev, "1 hour", "10 days").count() > 0
    # dedup key (user_id, event_type): user 1's two clicks collapse -> 4
    assert (
        stream_deduplicate(ev, watermark="10 days", within_watermark=False).count()
        == 4
    )


def test_read_table_at_csv_json_roundtrip(spark, tmp_path):
    """CSV and JSON scans land the same rows as the parquet original;
    explicit schema skips csv inference."""
    from networkframe_spark.sources import read_table_at

    src = spark.read.parquet("/root/testdata/sf0.001/region.parquet")
    csv_p = str(tmp_path / "region_csv")
    json_p = str(tmp_path / "region_json")
    src.write.option("header", "true").csv(csv_p)
    src.write.json(json_p)

    want = sorted(tuple(r) for r in src.collect())
    got_csv = sorted(
        tuple(r)
        for r in read_table_at(spark, csv_p, "csv", schema=src.schema).collect()
    )
    got_json = sorted(
        tuple(r)
        for r in read_table_at(spark, json_p, "json", schema=src.schema).collect()
    )
    assert got_csv == want and got_json == want
    # inferred csv still matches on values (dtypes may widen)
    inferred = read_table_at(spark, csv_p, "csv")
    assert inferred.count() == src.count()
    import pytest as _pytest

    with _pytest.raises(ValueError):
        read_table_at(spark, csv_p, "xml")


def test_normalize_event_time_rejects_implausible_bigint(spark):
    import pytest as _pytest

    # epoch-SECONDS magnitude (~1.7e9): nanos interpretation would
    # silently collapse to ~1970 — must raise instead
    df = spark.createDataFrame([(1, 1700000000)], "id long, ts long")
    out = normalize_event_time(df, "ts")
    with _pytest.raises(Exception, match="not plausible epoch-nanoseconds"):
        out.collect()
    # genuine nanos (~1.6e18) still convert
    ok = spark.createDataFrame([(1, 1600000000000000000)], "id long, ts long")
    row = normalize_event_time(ok, "ts").first()
    assert row["ts"].year == 2020


def test_compact_parquet_reduces_files(spark, tmp_path):
    """32 fragment files compact to 1; content survives exactly; the
    per-file record cap splits output when the target is small."""
    import glob

    from networkframe_spark.sources import compact_parquet

    df = spark.range(1000).selectExpr("id", "id % 7 AS grp")
    src = str(tmp_path / "src")
    df.repartition(32).write.parquet(src)
    assert len(glob.glob(src + "/part-*")) == 32

    dst = str(tmp_path / "dst")
    back = compact_parquet(spark, src, dst, target_records_per_file=10_000)
    assert len(glob.glob(dst + "/part-*")) == 1
    assert back.count() == 1000
    assert {r["id"] for r in back.collect()} == set(range(1000))

    dst2 = str(tmp_path / "dst2")
    back2 = compact_parquet(
        spark, src, dst2, target_records_per_file=300, sort_by=["id"]
    )
    assert len(glob.glob(dst2 + "/part-*")) >= 4  # ceil(1000/300)
    assert back2.count() == 1000


def test_read_table_at_orc_roundtrip(spark, tmp_path):
    """ORC round-trips through the format dispatcher with pushdown
    reaching the scan like parquet."""
    from networkframe_spark.sources import read_table_at

    src = spark.range(100).selectExpr("id", "id * 2 AS v")
    p = str(tmp_path / "t_orc")
    src.write.orc(p)
    back = read_table_at(spark, p, fmt="orc")
    assert back.count() == 100
    filtered = back.filter("id > 90")
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "orc" in plan.lower() and "PushedFilters" in plan
    assert filtered.count() == 9
