import pytest

from v3io_tsdb_spark.errors import BadRequest
from v3io_tsdb_spark.timeutils import get_time_range, str2duration_ms, str2unix_ms


def test_durations():
    # ref: pkg/utils/timeutils.go:40-74
    assert str2duration_ms("90s") == 90_000
    assert str2duration_ms("15m") == 900_000
    assert str2duration_ms("2h") == 7_200_000
    assert str2duration_ms("7d") == 604_800_000
    assert str2duration_ms("250") == 250
    assert str2duration_ms(1000) == 1000
    with pytest.raises(BadRequest):
        str2duration_ms("1w")
    with pytest.raises(BadRequest):
        str2duration_ms("")


def test_unix_times():
    # ref: pkg/utils/timeutils.go:80-112
    now = 1_600_000_000_000
    assert str2unix_ms("now", now_ms=now) == now
    assert str2unix_ms("now-1h", now_ms=now) == now - 3_600_000
    assert str2unix_ms("now+2d", now_ms=now) == now + 2 * 86_400_000
    assert str2unix_ms("1532209200000") == 1532209200000
    assert str2unix_ms(1532209200000) == 1532209200000
    assert str2unix_ms("2018-07-21T21:40:00Z") == 1532209200000
    assert str2unix_ms(None) is None


def test_time_range():
    now = 1_600_000_000_000
    f, t = get_time_range(None, None, last="1h", now_ms=now)
    assert (f, t) == (now - 3_600_000, now)
    f, t = get_time_range(None, None, now_ms=now)
    assert (f, t) == (now - 3_600_000, now)
    with pytest.raises(BadRequest):
        get_time_range(now, now - 1, now_ms=now)


def test_rate_to_hours_reference_goldens():
    """Mirror of pkg/tsdb/schema/schema_test.go:30-56 TestRateToHour."""
    import pytest

    from v3io_tsdb_spark.errors import BadRequest
    from v3io_tsdb_spark.timeutils import rate_to_hours

    assert rate_to_hours("1/s") == 3600
    assert rate_to_hours("12/m") == 12 * 60
    assert rate_to_hours("2/h") == 2
    for bad in ("1m", "1/t", "-431/t", "-1", ""):
        with pytest.raises(BadRequest):
            rate_to_hours(bad)


def test_granularity_validation_reference_goldens():
    """Mirror of schema_test.go:58-83 granularity divisor/dividend-of-a-
    day rule (the array-size branch is v3io-object-capacity-specific
    and n/a for Parquet storage)."""
    import pytest

    from v3io_tsdb_spark.config import TSDBConfig
    from v3io_tsdb_spark.errors import SchemaError

    TSDBConfig(aggregation_granularity="1h").validate()
    TSDBConfig(aggregation_granularity="15m").validate()
    TSDBConfig(aggregation_granularity="30m").validate()
    TSDBConfig(aggregation_granularity="48h").validate()  # dividend of a day
    with pytest.raises(SchemaError):
        TSDBConfig(aggregation_granularity="7h").validate()
    with pytest.raises(SchemaError):
        TSDBConfig(aggregation_granularity="25h").validate()
    # rate validation is wired through validate() as well
    TSDBConfig(ingestion_rate="12/m").validate()
    from v3io_tsdb_spark.errors import BadRequest

    with pytest.raises(BadRequest):
        TSDBConfig(ingestion_rate="1m").validate()
