"""asof_join vs DuckDB's native ASOF JOIN — exact multiset equality.

In-test oracle (not a driver query: the driver's 50-entry artifact is
kept at exactly the 50 oracle-backed queries), same evidence grade —
DuckDB implements the reference semantics natively.
"""

import datetime as dt

import duckdb
import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from bfokg.operators.temporal import asof_join

BASE = dt.datetime(2026, 1, 1)


def _frames(seed=7, n_left=300, n_right=200, users=5):
    rng = np.random.default_rng(seed)
    # unique (user, ts) on the right: sample offsets without replacement
    left = pd.DataFrame(
        {
            "user_id": rng.integers(1, users + 1, n_left),
            "ts": [BASE + dt.timedelta(seconds=int(s))
                   for s in rng.integers(0, 5000, n_left)],
            "turn": np.arange(n_left),
        }
    )
    offs = rng.choice(5000, size=n_right, replace=False)
    right = pd.DataFrame(
        {
            "user_id": rng.integers(1, users + 1, n_right),
            "ts": [BASE + dt.timedelta(seconds=int(s)) for s in offs],
            "value": rng.random(n_right).round(6),
        }
    )
    # force a few exact-tie timestamps to pin inclusivity
    right.loc[0, ["user_id", "ts"]] = [left.loc[0, "user_id"], left.loc[0, "ts"]]
    right.loc[1, "value"] = 0.5
    return left, right


def _duck_asof(left, right, direction, tolerance_s=None):
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    cmp = "l.ts >= r.ts" if direction == "backward" else "l.ts <= r.ts"
    q = f"""
    SELECT l.user_id, l.ts, l.turn, r.ts AS ts_right, r.value AS value_right
    FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND {cmp}
    """
    out = con.sql(q).df()
    if tolerance_s is not None:
        gap = (out["ts"] - out["ts_right"]).abs() > pd.Timedelta(seconds=tolerance_s)
        out.loc[gap, ["ts_right", "value_right"]] = [pd.NaT, np.nan]
    return out


def _as_set(df):
    def norm(v):
        if v is None or (isinstance(v, float) and np.isnan(v)) or pd.isna(v):
            return None
        if isinstance(v, (pd.Timestamp, dt.datetime)):
            return pd.Timestamp(v).to_pydatetime()
        return v

    return sorted(
        tuple(norm(v) for v in row)
        for row in df[["user_id", "ts", "turn", "ts_right", "value_right"]]
        .itertuples(index=False)
    )


@pytest.mark.parametrize("direction,seed", [
    ("backward", 7), ("forward", 7), ("backward", 41), ("forward", 41),
])
def test_asof_join_matches_duckdb(spark, direction, seed):
    left, right = _frames(seed=seed)
    # uniqueness precondition for well-defined ties
    assert not right.duplicated(["user_id", "ts"]).any()
    got = asof_join(
        spark.createDataFrame(left),
        spark.createDataFrame(right),
        on="ts",
        by="user_id",
        direction=direction,
    ).toPandas()
    want = _duck_asof(left, right, direction)
    assert _as_set(got) == _as_set(want)
    # the planted exact-tie timestamp must match (inclusive semantics)
    tie = got[got.turn == 0].iloc[0]
    assert tie.ts_right == tie.ts


def test_asof_join_empty_right(spark):
    left, _ = _frames()
    empty = spark.createDataFrame([], "user_id long, ts timestamp, value double")
    got = asof_join(
        spark.createDataFrame(left), empty, on="ts", by="user_id"
    ).toPandas()
    assert len(got) == len(left) and got.value_right.isna().all()


def test_asof_join_tolerance_and_unmatched(spark):
    left, right = _frames(seed=11)
    got = asof_join(
        spark.createDataFrame(left),
        spark.createDataFrame(right),
        on="ts",
        by="user_id",
        direction="backward",
        tolerance="INTERVAL 90 SECONDS",
    ).toPandas()
    want = _duck_asof(left, right, "backward", tolerance_s=90)
    assert _as_set(got) == _as_set(want)
    assert got.ts_right.isna().any()            # tolerance actually nulls some
    assert len(got) == len(left)                # left join: every row kept


def _duck_asof_global(left, right, direction, tolerance_s=None):
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    cmp = "l.ts >= r.ts" if direction == "backward" else "l.ts <= r.ts"
    out = con.sql(
        f"""SELECT l.user_id, l.ts, l.turn, r.ts AS ts_right,
                   r.value AS value_right
            FROM l ASOF LEFT JOIN r ON {cmp}"""
    ).df()
    if tolerance_s is not None:
        gap = (out["ts"] - out["ts_right"]).abs() > pd.Timedelta(seconds=tolerance_s)
        out.loc[gap, ["ts_right", "value_right"]] = [pd.NaT, np.nan]
    return out


@pytest.mark.parametrize(
    "direction,bucket_s",
    [
        ("backward", 60),          # mixed in-bucket + carry
        ("backward", 1),           # most buckets right-less: carry-dominated
        ("backward", 10**9),       # single bucket: pure within-bucket path
        ("forward", 60),
        ("forward", 10**9),
    ],
)
def test_asof_join_global_matches_duckdb(spark, direction, bucket_s):
    from bfokg.operators.temporal import asof_join_global

    left, right = _frames(seed=5)
    right = right.drop_duplicates(["ts"])  # global as-of: unique per ts
    got = asof_join_global(
        spark.createDataFrame(left),
        spark.createDataFrame(right[["ts", "value"]]),
        on="ts",
        direction=direction,
        bucket_seconds=bucket_s,
    ).toPandas()
    want = _duck_asof_global(left, right, direction)
    assert _as_set(got) == _as_set(want)


@pytest.mark.parametrize(
    "direction,bucket_s",
    [("backward", 60), ("backward", 1), ("backward", 10**9),
     ("forward", 60), ("forward", 1)],
)
def test_asof_join_bucketed_keyed_equals_plain(spark, direction, bucket_s):
    """asof_join_global(by=…) — the hub-key straggler-proof variant —
    must produce byte-identical output to the plain keyed asof_join at
    every bucket width (the carry window is per-key over bucket
    summaries, so nothing about bucketing may change semantics)."""
    from bfokg.operators.temporal import asof_join_global

    left, right = _frames(seed=19)
    sl = spark.createDataFrame(left)
    sr = spark.createDataFrame(right)
    plain = asof_join(sl, sr, on="ts", by="user_id", direction=direction)
    bucketed = asof_join_global(
        sl, sr, on="ts", by="user_id", direction=direction,
        bucket_seconds=bucket_s,
    )
    assert _as_set(plain.toPandas()) == _as_set(bucketed.toPandas())


def test_asof_join_bucketed_keyed_tolerance(spark):
    from bfokg.operators.temporal import asof_join_global

    left, right = _frames(seed=29)
    sl, sr = spark.createDataFrame(left), spark.createDataFrame(right)
    plain = asof_join(sl, sr, on="ts", by="user_id",
                      tolerance="INTERVAL 90 SECONDS")
    bucketed = asof_join_global(sl, sr, on="ts", by="user_id",
                                bucket_seconds=120,
                                tolerance="INTERVAL 90 SECONDS")
    assert _as_set(plain.toPandas()) == _as_set(bucketed.toPandas())


def test_asof_join_global_tolerance(spark):
    from bfokg.operators.temporal import asof_join_global

    left, right = _frames(seed=13)
    right = right.drop_duplicates(["ts"])
    got = asof_join_global(
        spark.createDataFrame(left),
        spark.createDataFrame(right[["ts", "value"]]),
        on="ts",
        bucket_seconds=120,
        tolerance="INTERVAL 90 SECONDS",
    ).toPandas()
    want = _duck_asof_global(left, right, "backward", tolerance_s=90)
    assert _as_set(got) == _as_set(want)
    assert len(got) == len(left)


def _interval_frames(seed=17, n_pts=250, n_iv=60, users=4):
    rng = np.random.default_rng(seed)
    pts = pd.DataFrame(
        {
            "user_id": rng.integers(1, users + 1, n_pts),
            "ts": [BASE + dt.timedelta(seconds=int(s))
                   for s in rng.integers(0, 50_000, n_pts)],
            "turn": np.arange(n_pts),
        }
    )
    starts = rng.integers(0, 50_000, n_iv)
    lengths = rng.integers(-500, 20_000, n_iv)  # some start > end (invalid)
    iv = pd.DataFrame(
        {
            "user_id": rng.integers(1, users + 1, n_iv),
            "start": [BASE + dt.timedelta(seconds=int(s)) for s in starts],
            "end": [BASE + dt.timedelta(seconds=int(s + l))
                    for s, l in zip(starts, lengths)],
            "label": [f"iv{i}" for i in range(n_iv)],
        }
    )
    return pts, iv


def _duck_interval(pts, iv, how, keyed):
    con = duckdb.connect()
    con.register("p", pts)
    con.register("i", iv)
    key = "AND p.user_id = i.user_id" if keyed else ""
    join = "JOIN" if how == "inner" else "LEFT JOIN"
    return con.sql(
        f"""SELECT p.user_id, p.ts, p.turn, i.start AS start_right,
                   i.end AS end_right, i.label AS label_right
            FROM p {join} i ON p.ts BETWEEN i.start AND i.end {key}"""
    ).df()


@pytest.mark.parametrize(
    "how,keyed,bucket_s",
    [
        ("inner", True, 3600),
        ("inner", False, 600),
        ("left", True, 3600),
        ("inner", True, 10**7),   # single bucket: degenerates to plain join
    ],
)
def test_interval_join_matches_duckdb(spark, how, keyed, bucket_s):
    from bfokg.operators.temporal import interval_join

    pts, iv = _interval_frames()
    right = iv if keyed else iv.drop(columns=["user_id"])
    got = interval_join(
        spark.createDataFrame(pts),
        spark.createDataFrame(right),
        on="ts", by="user_id" if keyed else None,
        bucket_seconds=bucket_s, how=how, guard="off",
    ).toPandas()
    want = _duck_interval(pts, iv, how, keyed)

    def norm(df):
        return sorted(
            tuple(None if pd.isna(v) else v for v in row)
            for row in df[["user_id", "ts", "turn", "start_right", "end_right",
                           "label_right"]].itertuples(index=False)
        )

    assert norm(got) == norm(want)
    if how == "inner":
        assert len(got) > len(pts) * 0.5  # 1:N join actually multiplies


def test_interval_join_expansion_guard(spark):
    from bfokg.operators.temporal import interval_join

    pts, iv = _interval_frames()
    sp, si = spark.createDataFrame(pts), spark.createDataFrame(iv)
    with pytest.raises(ValueError, match="expansion"):
        interval_join(sp, si, by="user_id", bucket_seconds=1, guard="strict")
    with pytest.warns(UserWarning, match="expansion"):
        interval_join(sp, si, by="user_id", bucket_seconds=1, guard="warn")


def test_sessionize_matches_duckdb(spark):
    """sessionize vs the identical two-window SQL in DuckDB, plus hand
    pins: a gap exactly equal to the threshold does NOT split."""
    from bfokg.operators.temporal import sessionize

    left, _ = _frames(seed=23, n_left=400)
    left = left.drop_duplicates(["user_id", "ts"])  # deterministic lag order
    got = sessionize(
        spark.createDataFrame(left), ts_col="ts", by="user_id",
        gap="INTERVAL 5 MINUTES",
    ).toPandas()
    con = duckdb.connect()
    con.register("t", left)
    want = con.sql(
        """
        SELECT user_id, ts, turn,
               user_id::VARCHAR || '#' ||
               sum(CASE WHEN prev IS NULL OR ts > prev + INTERVAL 5 MINUTES
                        THEN 1 ELSE 0 END)
                 OVER (PARTITION BY user_id ORDER BY ts
                       ROWS UNBOUNDED PRECEDING)::VARCHAR AS session_id
        FROM (SELECT *, lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
              FROM t)
        """
    ).df()
    key = ["user_id", "ts", "turn"]
    g = got.sort_values(key).reset_index(drop=True)
    w = want.sort_values(key).reset_index(drop=True)
    assert list(g.session_id) == list(w.session_id)
    assert g.session_id.nunique() > left.user_id.nunique()  # gaps actually split

    # boundary pin: gap == threshold stays in-session; gap+1s splits
    b = pd.DataFrame(
        {
            "user_id": [1, 1, 1],
            "ts": [BASE, BASE + dt.timedelta(minutes=5),
                   BASE + dt.timedelta(minutes=10, seconds=1)],
            "turn": [0, 1, 2],
        }
    )
    sb = sessionize(
        spark.createDataFrame(b), by="user_id", gap="INTERVAL 5 MINUTES"
    ).toPandas().sort_values("turn")
    assert list(sb.session_id) == ["1#1", "1#1", "1#2"]


def test_sessionize_parity_with_spark_session_window(spark):
    """Cross-check against Spark's built-in session_window: per-session
    (user, first-event ts, row count) multisets must be identical.
    Timestamps carry random sub-second microseconds, so exact-gap
    boundaries (where the two definitions could differ) have measure
    zero."""
    from pyspark.sql import functions as F

    from bfokg.operators.temporal import sessionize

    rng = np.random.default_rng(31)
    pdf = pd.DataFrame(
        {
            "user_id": rng.integers(1, 6, 400),
            "ts": [BASE + dt.timedelta(seconds=float(s))
                   for s in rng.uniform(0, 50_000, 400)],
        }
    )
    df = spark.createDataFrame(pdf)
    ours = (
        sessionize(df, by="user_id", gap="INTERVAL 5 MINUTES")
        .groupBy("user_id", "session_id")
        .agg(F.min("ts").alias("start"), F.count(F.lit(1)).alias("n"))
    )
    theirs = df.groupBy(
        F.session_window("ts", "5 minutes").alias("w"), "user_id"
    ).agg(F.count(F.lit(1)).alias("n"))
    a = sorted((r.user_id, r.start, r.n) for r in ours.collect())
    b = sorted((r.user_id, r.w.start, r.n) for r in theirs.collect())
    assert a == b and len(a) > 10


def test_bucketed_ops_accept_timestamp_ntz(spark):
    """Parquet timestamps come back TIMESTAMP_NTZ, which Spark 4's
    unix_micros rejects outright — the bucketed operators must accept
    both flavors and produce identical matches (caught by the verify
    drive over the events table, not by pandas-built test frames, which
    are always TIMESTAMP)."""
    from pyspark.sql import functions as F

    from bfokg.operators.temporal import asof_join_global, interval_join

    left, right = _frames(seed=3)
    right = right.drop_duplicates(["ts"])
    sl, sr = spark.createDataFrame(left), spark.createDataFrame(right[["ts", "value"]])
    ntz = lambda df: df.select(  # noqa: E731
        *[F.col(c).cast("timestamp_ntz").alias(c) if c == "ts" else F.col(c)
          for c in df.columns]
    )
    got_ts = asof_join_global(sl, sr, on="ts", bucket_seconds=600).toPandas()
    got_ntz = asof_join_global(ntz(sl), ntz(sr), on="ts", bucket_seconds=600).toPandas()
    assert _as_set(got_ts) == _as_set(got_ntz)

    iv = sr.select(F.col("ts").alias("start"),
                   (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("end"),
                   "value")
    iv_ntz = iv.select(F.col("start").cast("timestamp_ntz").alias("start"),
                       F.col("end").cast("timestamp_ntz").alias("end"), "value")
    a = interval_join(sl, iv, on="ts", guard="off").toPandas()
    b = interval_join(ntz(sl), iv_ntz, on="ts", guard="off").toPandas()
    assert len(a) == len(b) and sorted(a.turn) == sorted(b.turn)


def test_temporal_ops_repartition_invariant(spark):
    """Cluster layout must never change results: the same inputs through
    arbitrary repartitioning produce identical rows (sessionize ids,
    asof matches)."""
    from bfokg.operators.temporal import sessionize

    left, right = _frames(seed=37)
    left = left.drop_duplicates(["user_id", "ts"])
    df, dr = spark.createDataFrame(left), spark.createDataFrame(right)

    s1 = sessionize(df, by="user_id", gap="INTERVAL 5 MINUTES").toPandas()
    s2 = sessionize(df.repartition(7), by="user_id",
                    gap="INTERVAL 5 MINUTES").toPandas()
    key = lambda d: sorted(map(tuple, d[["user_id", "ts", "session_id"]].values))  # noqa: E731
    assert key(s1) == key(s2)

    a1 = asof_join(df, dr, on="ts", by="user_id").toPandas()
    a2 = asof_join(df.repartition(5), dr.repartition(3), on="ts",
                   by="user_id").toPandas()
    assert _as_set(a1) == _as_set(a2)


def test_asof_join_refuses_global(spark):
    left, right = _frames()
    with pytest.raises(ValueError, match="by-keys"):
        asof_join(spark.createDataFrame(left), spark.createDataFrame(right),
                  on="ts", by=None)
