"""As-of join unit tests (inclusive bound, unmatched rows, tolerance)."""

import datetime as dt

from ade_agente_documental_empresarial___miner_a_spark.operators.asof import asof_join


def ts(s):
    return dt.datetime.fromisoformat(s)


def make(spark):
    left = spark.createDataFrame(
        [
            (1, ts("2024-01-01T10:00:00"), 100),
            (1, ts("2024-01-01T12:00:00"), 200),
            (2, ts("2024-01-01T09:00:00"), 300),  # before any right row
        ],
        "user_id long, ts timestamp, lval int",
    )
    right = spark.createDataFrame(
        [
            (1, ts("2024-01-01T09:30:00"), "a"),
            (1, ts("2024-01-01T10:00:00"), "b"),  # same instant as left #1
            (1, ts("2024-01-01T11:59:00"), "c"),
            (2, ts("2024-01-01T09:30:00"), "d"),  # after left #3
        ],
        "user_id long, ts timestamp, tag string",
    )
    return left, right


def test_backward_inclusive_match(spark):
    left, right = make(spark)
    out = {
        (r.user_id, r.lval): r.tag_right
        for r in asof_join(left, right, on="user_id").collect()
    }
    # same-instant right row matches (inclusive >=)
    assert out[(1, 100)] == "b"
    assert out[(1, 200)] == "c"
    # left row before any right row -> null (left-join semantics)
    assert out[(2, 300)] is None


def test_tolerance_drops_stale_matches(spark):
    left, right = make(spark)
    out = {
        (r.user_id, r.lval): r.tag_right
        for r in asof_join(
            left, right, on="user_id", tolerance_seconds=90
        ).collect()
    }
    assert out[(1, 100)] == "b"    # 0s lag, within tolerance
    assert out[(1, 200)] == "c"    # 60s lag, within tolerance
    assert out[(2, 300)] is None


def test_row_counts_are_left_counts(spark):
    left, right = make(spark)
    assert asof_join(left, right, on="user_id").count() == left.count()
