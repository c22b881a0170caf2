"""Property test (hypothesis): the rollup-served (server) aggregation
path and the client path must agree on ANY bucket-aligned query, for
arbitrary sample layouts — the router's core invariant, randomized
where test_rollup_router_agreement pins one fixed case.

Sample times, values (including negatives and repeats), step multiple,
and the requested function subset are all drawn by hypothesis; the two
paths execute genuinely different plans (pre-aggregate partials vs raw
samples), so agreement here is a real differential check, not a
tautology."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from v3io_tsdb_spark.adapter import TSDBAdapter
from v3io_tsdb_spark.config import TSDBConfig
from v3io_tsdb_spark.querier import SelectParams

T0H = 1532206800000  # hour-aligned anchor inside the reference window
HOUR = 3_600_000
FUNCS = ["sum", "count", "min", "max", "avg", "last", "stddev", "stdvar"]

samples_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=12 * 60 - 1),  # minute offset
        st.floats(min_value=-50, max_value=50, allow_nan=False, width=32),
        st.sampled_from(["a", "b"]),                      # series label
    ),
    min_size=1,
    max_size=60,
    unique_by=lambda t: (t[0], t[2]),
)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    samples=samples_strategy,
    step_mult=st.integers(min_value=4, max_value=6),  # router needs step/gran > 3
    funcs=st.sets(st.sampled_from(FUNCS), min_size=1, max_size=4),
)
def test_server_and_client_paths_agree(tmp_path_factory, spark, samples, step_mult, funcs):
    d = tmp_path_factory.mktemp("router_prop")
    a = TSDBAdapter(spark, str(d), config=TSDBConfig(aggregation_granularity="1h"))
    a.create()
    a.append(
        [
            {"ts": T0H + off * 60_000, "name": "cpu", "labels": {"os": s},
             "value": float(v)}
            for off, v, s in samples
        ]
    )
    flist = sorted(funcs)
    q = a.querier()
    params = dict(
        name="cpu",
        functions=",".join(flist),
        step=f"{step_mult}h",
        from_time=T0H,
        to_time=T0H + 12 * HOUR,
    )
    assert q._can_use_rollup(flist, step_mult * HOUR, 0, SelectParams(**params))
    server = q.select(SelectParams(**params)).collect()
    client = q.select(SelectParams(**params, use_only_client_aggr=True)).collect()

    def key(rows):
        return {
            (r["labels"]["os"], r["t"]): [r[f] for f in flist]
            for r in rows
        }

    skey, ckey = key(server), key(client)
    assert set(skey) == set(ckey)
    for k in skey:
        # abs tolerance covers stddev's sqr-partial cancellation noise
        assert skey[k] == pytest.approx(ckey[k], rel=1e-9, abs=1e-6)
