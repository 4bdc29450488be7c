"""As-of join semantics: the union+window Spark formulation must agree with
DuckDB's NATIVE ``ASOF JOIN`` (an independent implementation, not the same
formulation re-run) on crafted data, and handle the edge cases: no prior
match, inclusive equality, multiple candidates, interleaved keys."""

import datetime as dt

import duckdb
from pyspark.sql import functions as F

from open_parse_spark.operators.joins import asof_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


LEFT = [  # (event_id, user_id, ts)
    (100, 1, _ts("2024-01-01T10:00:00")),  # after two clicks -> latest (12)
    (101, 1, _ts("2024-01-01T08:30:00")),  # between clicks  -> first (11)
    (102, 1, _ts("2024-01-01T07:00:00")),  # before any click -> null
    (103, 2, _ts("2024-01-01T09:00:00")),  # exact tie with click 21 -> inclusive
    (104, 3, _ts("2024-01-01T09:00:00")),  # user with no clicks -> null
]
RIGHT = [  # (event_id, user_id, ts)
    (11, 1, _ts("2024-01-01T08:00:00")),
    (12, 1, _ts("2024-01-01T09:30:00")),
    (21, 2, _ts("2024-01-01T09:00:00")),
]
EXPECT = {100: 12, 101: 11, 102: None, 103: 21, 104: None}


def test_asof_join_edge_cases(spark):
    l = spark.createDataFrame(LEFT, ["event_id", "user_id", "ts"])
    r = spark.createDataFrame(RIGHT, ["event_id", "user_id", "ts"])
    out = asof_join(
        l, r, key="user_id", ts="ts", tie="event_id",
        right_cols=("ts", "event_id"), prefix="click_",
    ).toPandas()
    got = {
        int(row.event_id): (None if row.click_event_id != row.click_event_id
                            else int(row.click_event_id))
        for row in out.itertuples()
    }
    assert got == EXPECT


def test_asof_join_matches_duckdb_native(spark):
    """Same answer as DuckDB's built-in ASOF JOIN (independent engine)."""
    con = duckdb.connect()
    con.execute("CREATE TABLE l(event_id BIGINT, user_id BIGINT, ts TIMESTAMP)")
    con.execute("CREATE TABLE r(event_id BIGINT, user_id BIGINT, ts TIMESTAMP)")
    con.executemany("INSERT INTO l VALUES (?, ?, ?)", LEFT)
    con.executemany("INSERT INTO r VALUES (?, ?, ?)", RIGHT)
    native = con.execute(
        """
        SELECT l.event_id, r.event_id AS click_event_id
        FROM l ASOF LEFT JOIN r
          ON l.user_id = r.user_id AND l.ts >= r.ts
        ORDER BY l.event_id
        """
    ).fetchall()
    got = {eid: c for eid, c in native}
    assert got == EXPECT  # DuckDB native agrees with the crafted truth

    l = spark.createDataFrame(LEFT, ["event_id", "user_id", "ts"])
    r = spark.createDataFrame(RIGHT, ["event_id", "user_id", "ts"])
    out = asof_join(
        l, r, key="user_id", ts="ts", tie="event_id",
        right_cols=("event_id",), prefix="click_",
    ).toPandas()
    spark_got = {
        int(row.event_id): (None if row.click_event_id != row.click_event_id
                            else int(row.click_event_id))
        for row in out.itertuples()
    }
    assert spark_got == got


def test_asof_join_carries_all_left_columns(spark):
    l = spark.createDataFrame(
        [(1, 1, _ts("2024-01-01T10:00:00"), "extra")],
        ["event_id", "user_id", "ts", "payload"],
    )
    r = spark.createDataFrame(RIGHT, ["event_id", "user_id", "ts"])
    out = asof_join(
        l, r, key="user_id", ts="ts", tie="event_id",
        right_cols=("ts", "event_id"), prefix="m_",
    )
    assert set(out.columns) == {"event_id", "user_id", "ts", "payload", "m_ts", "m_event_id"}
    row = out.collect()[0]
    assert row.payload == "extra" and row.m_event_id == 12


def test_asof_payload_columns_come_from_one_row(spark):
    """A NULL in the latest right row must stay NULL — per-column carry
    would back-fill it from an older row, fabricating a mixed row."""
    import pandas as pd

    from open_parse_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        pd.DataFrame({"user_id": [1], "ts": [3], "event_id": [100]})
    )
    right = spark.createDataFrame(
        pd.DataFrame(
            {
                "user_id": [1, 1],
                "ts": [1, 2],
                "event_id": [10, 11],
                "price": [10.0, 20.0],
                "qty": [5.0, None],
            }
        )
    )
    row = asof_join(
        left, right, key="user_id", ts="ts", tie="event_id",
        right_cols=("price", "qty"),
    ).collect()[0]
    assert row["right_price"] == 20.0
    assert row["right_qty"] is None, "qty back-filled from an older right row"
