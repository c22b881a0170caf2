"""Label-set and label-value discovery — mirrors the reference's
getLabelSets golden suite (ref: pkg/pquerier/pqueriertest/
get_labelsets_integration_test.go:72-228): same fixtures (three cpu
series over os/region labels, one diskio series), same expected sets,
including the metric name surfacing as the ``__name__`` label."""

from pyspark.sql import functions as F  # noqa: F401

from tests.conftest import T0
from v3io_tsdb_spark.querier import Querier

LBLS = [
    {"os": "linux", "region": "europe"},
    {"os": "linux", "region": "asia"},
    {"os": "mac", "region": "europe"},
]


def _fixture(make_samples, extra_metric: bool = False):
    series = [("cpu", lb, [(0, 10.0)]) for lb in LBLS]
    if extra_metric:
        series.append(("diskio", LBLS[0], [(0, 10.0)]))
    return make_samples(series)


def _sets(df):
    return sorted(
        (r["name"], r["labels_str"], dict(r["labels"])) for r in df.collect()
    )


def test_get_labels_one_metric(spark, make_samples):
    """TestGetLabels: three label sets back, each carrying __name__."""
    q = Querier(spark, _fixture(make_samples, extra_metric=True))
    got = _sets(q.get_label_sets(metric="cpu"))
    assert len(got) == 3
    assert {g[1] for g in got} == {
        "os=linux,region=europe", "os=linux,region=asia", "os=mac,region=europe"
    }
    for name, _s, labels in got:
        assert name == "cpu" and labels["__name__"] == "cpu"
        assert set(labels) == {"os", "region", "__name__"}


def test_get_labels_all_metrics(spark, make_samples):
    """TestGetLabelsAllMetrics: no metric filter → sets from every
    metric, disambiguated by __name__."""
    q = Querier(spark, _fixture(make_samples, extra_metric=True))
    got = _sets(q.get_label_sets())
    assert len(got) == 4
    assert {g[0] for g in got} == {"cpu", "diskio"}


def test_get_labels_with_filter(spark, make_samples):
    """TestGetLabelsWithFilter: v3io filter dialect restricts the
    sets (os=='linux' → two cpu sets)."""
    q = Querier(spark, _fixture(make_samples))
    got = _sets(q.get_label_sets(metric="cpu", filter="os=='linux'"))
    assert [g[1] for g in got] == [
        "os=linux,region=asia", "os=linux,region=europe"
    ]


def test_label_values(spark, make_samples):
    """LabelValues: distinct values of one key; filter composes."""
    q = Querier(spark, _fixture(make_samples))
    vals = sorted(r["value"] for r in q.label_values("region").collect())
    assert vals == ["asia", "europe"]
    vals = sorted(
        r["value"] for r in q.label_values("region", filter="os=='mac'").collect()
    )
    assert vals == ["europe"]
    # absent key → empty, not an error (parity: reference returns empty)
    assert q.label_values("datacenter").count() == 0


def test_label_values_name_dispatch_and_label_names(spark, make_samples):
    """LabelValues('__name__') returns metric names (reference special
    case, querier.go:217-219); label_names lists distinct keys — real
    here where the reference stubs it to nil (querier.go:227-229)."""
    q = Querier(spark, _fixture(make_samples, extra_metric=True))
    assert sorted(r["value"] for r in q.label_values("__name__").collect()) == [
        "cpu", "diskio"
    ]
    assert sorted(r["name"] for r in q.label_names().collect()) == ["os", "region"]


def test_adapter_start_time(spark, tmp_path):
    """start_time is the true earliest sample ms (reference hardcodes
    now-1000d, v3iotsdb.go:250-253); empty table → None."""
    from v3io_tsdb_spark.adapter import TSDBAdapter

    ad = TSDBAdapter(spark, str(tmp_path / "tsdb")).create()
    assert ad.start_time() is None
    ad.append([
        {"ts": T0 + 5_000, "name": "cpu", "labels": {"h": "a"}, "value": 1.0},
        {"ts": T0, "name": "cpu", "labels": {"h": "a"}, "value": 2.0},
        {"ts": T0 + 86_400_000 * 3, "name": "cpu", "labels": {"h": "a"}, "value": 3.0},
    ])
    assert ad.start_time() == T0
