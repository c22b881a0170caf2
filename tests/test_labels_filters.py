import pytest

from v3io_tsdb_spark.errors import BadRequest
from v3io_tsdb_spark.labels import labels_from_string, labels_to_string, validate_metric_name
from v3io_tsdb_spark.sql.filters import translate_filter


def test_labels_codec():
    # ref: pkg/utils/labels.go:73-95 (GetKey)
    assert labels_to_string({"b": "2", "a": "1"}) == "a=1,b=2"
    assert labels_to_string({}) == ""
    assert labels_from_string("a=1,b=2") == {"a": "1", "b": "2"}
    assert labels_from_string("") == {}


def test_metric_name_validation():
    validate_metric_name("cpu_seconds:total")
    with pytest.raises(BadRequest):
        validate_metric_name("1bad")
    with pytest.raises(BadRequest):
        validate_metric_name("")


def test_filter_translation():
    # dialect ref: README.md:96, pkg/pquerier/sql_parser.go:171-173
    assert translate_filter("os=='linux'") == "labels['os']='linux'"
    assert (
        translate_filter('os=="linux" and region!="europe"')
        == "labels['os']='linux' and labels['region']<>'europe'"
    )
    assert translate_filter("exists(region)") == "(labels['region'] IS NOT NULL)"
    t = translate_filter("starts(host, 'web')")
    assert t == "startswith(labels['host'], 'web')"
    assert translate_filter("_name=='cpu'") == "name='cpu'"
    assert translate_filter("") == "true"


def test_filter_translation_runs(spark, make_samples):
    from pyspark.sql import functions as F

    df = make_samples(
        [
            ("cpu", {"os": "linux", "host": "web1"}, [(0, 1.0)]),
            ("cpu", {"os": "mac"}, [(0, 2.0)]),
        ]
    )
    got = df.where(F.expr(translate_filter("os=='linux' and starts(host,'web')"))).collect()
    assert len(got) == 1 and got[0]["value"] == 1.0
    got = df.where(F.expr(translate_filter("exists(host)"))).collect()
    assert len(got) == 1
