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


# -- SQL parser round-trip fuzz (round 7) -----------------------------------

_RESERVED = {
    "select", "from", "where", "group", "by", "as", "and", "or", "not",
    "order", "limit", "join", "having",
}
_ident = st.from_regex(r"[a-z][a-z0-9_]{0,9}", fullmatch=True).filter(
    lambda s: s not in _RESERVED
)
_func = st.sampled_from(["avg", "sum", "min", "max", "count", "stddev", "last"])
_interp = st.sampled_from(["prev_val", "next_val", "linear", "none"])


@st.composite
def _sql_query(draw):
    cols, specs, used = [], [], set()
    for _ in range(draw(st.integers(min_value=1, max_value=4))):
        metric = draw(_ident)
        func = draw(st.none() | _func)
        if (metric, func or "") in used:
            continue
        used.add((metric, func or ""))
        interp = draw(st.none() | _interp)
        tol = draw(st.none() | st.sampled_from(["10m", "1h"])) if interp else None
        inner = metric
        if interp:
            inner = f"{interp}({metric}, '{tol}')" if tol else f"{interp}({metric})"
        text = f"{func}({inner})" if func else inner
        alias = draw(st.none() | _ident)
        if alias and alias not in {m for m, _ in used} and alias not in used:
            text += f" as {alias}_x"  # suffix avoids metric shadowing
            alias = f"{alias}_x"
        else:
            alias = None
        cols.append(text)
        specs.append((metric, func or "", interp or "", tol, alias or ""))
    table = draw(st.none() | _ident)
    sql = "select " + ", ".join(cols)
    if table:
        sql += f" from {table}"
    group = draw(st.none() | _ident)
    if group:
        sql += f" group by {group}"
    return sql, specs, table, group


@settings(max_examples=40, deadline=None, suppress_health_check=list(HealthCheck))
@given(q=_sql_query())
def test_sql_parser_roundtrip_fuzz(q):
    """Any well-formed dialect query must parse back to exactly the
    column specs it was built from (metric, function, interpolator,
    tolerance, alias), plus table and group-by."""
    from v3io_tsdb_spark.errors import BadRequest
    from v3io_tsdb_spark.sql.parser import parse_query

    sql, specs, table, group = q
    # duplicate-alias collisions between independently-drawn columns
    # are legal generator output but a rejected query — skip those
    aliases = [a for *_, a in specs if a]
    try:
        parsed = parse_query(sql)
    except BadRequest:
        assert len(set(aliases)) != len(aliases)
        return
    assert parsed.table == (table or "tsdb")
    assert (parsed.group_by or None) == group
    got = [
        (c.metric, c.function, c.interpolator, c.tolerance, c.alias)
        for c in parsed.columns
    ]
    want = [
        (m, f, {"none": "none", "prev_val": "prev_val", "next_val": "next_val",
                "linear": "linear"}.get(i, i), t, a)
        for m, f, i, t, a in specs
    ]
    assert got == want, sql
