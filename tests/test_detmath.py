"""Bit-identity tests for the deterministic cross-engine
transcendentals (functions/detmath.py, VERDICT r12 #1/#2).

The contract under test: the SAME doubles in → the SAME doubles out,
bit for bit, in Spark (JVM), DuckDB (C++), and the pure-Python
reference — because the three emitters share one op program and
every op is a correctly-rounded IEEE-754 primitive.  This is the
property whose absence made ``events_session_perplexity`` driver
hash-red two rounds running (Spark ``F.log`` vs driver-host libm
``ln`` disagreeing by 1 ulp at a half-micro-nat boundary).
"""

import math
import random
import struct

import duckdb
import pytest
from pyspark.sql import functions as F

from v3io_tsdb_spark.functions import detmath
from v3io_tsdb_spark.functions.detmath import (
    benford_expected_sql,
    benford_expected_col,
    det_exp_py,
    det_exp_sql,
    det_ln_py,
    det_ln_sql,
    floor_log2_long,
    floor_log2_sql,
    with_det_exp,
    with_det_ln,
)


def _bits(x):
    if x is None:
        return None
    return struct.pack("<d", x)


def _ln_grid():
    random.seed(1234)
    xs = [
        1.0, 2.0, 0.5, 4.0, 0.25, 3.0, 10.0,
        detmath.SQRT2, math.nextafter(detmath.SQRT2, 0.0),
        math.nextafter(detmath.SQRT2, 2.0),
        math.nextafter(1.0, 0.0), math.nextafter(1.0, 2.0),
        2.0 ** -64, math.nextafter(2.0 ** 64, 0.0),
        1e-6, 2e-6, 123456e-6, 0.999999, 0.5e-6 + 0.5e-6,
    ]
    # dense 6dp probability grid sample (the micro-nat input domain)
    xs += [i / 1e6 for i in range(1, 2000)]
    xs += [i / 1e6 for i in range(999000, 1000001)]
    xs += [random.randrange(1, 10 ** 6) / 1e6 for _ in range(4000)]
    # wide log-spaced + random
    xs += [math.exp(random.uniform(-44, 44)) for _ in range(4000)]
    xs += [float(random.randrange(1, 2 ** 62)) for _ in range(1000)]
    return xs


def _exp_grid():
    random.seed(99)
    xs = [0.0, 1.0, -1.0, 0.5, -0.5, detmath.LN2 / 2, -detmath.LN2 / 2,
          700.0, -700.0, 88.0, -88.0, 1e-9, -1e-9]
    xs += [random.uniform(-700, 700) for _ in range(3000)]
    xs += [random.uniform(-30, 1) for _ in range(3000)]
    # micro-nat means: integers/1e6 (what the perplexity family feeds exp-like paths)
    xs += [-random.randrange(0, 20_000_000) / 1e6 for _ in range(2000)]
    return xs


def test_det_ln_bit_identity_spark_duckdb_python(spark):
    xs = _ln_grid()
    sdf = spark.createDataFrame([(i, x) for i, x in enumerate(xs)], "i long, x double")
    out = {r["i"]: r["y"] for r in
           with_det_ln(sdf, "y", F.col("x")).collect()}
    con = duckdb.connect()
    # register as float64 pandas (bit-exact transfer; a textual VALUES
    # literal routes through DECIMAL whose →DOUBLE cast drops an ulp)
    import pandas as pd
    con.register("t", pd.DataFrame({"i": range(len(xs)), "x": xs}))
    dd = dict(con.execute(
        "SELECT i, y FROM (" + det_ln_sql("SELECT * FROM t", "x", "y") + ")"
    ).fetchall())
    for i, x in enumerate(xs):
        py = det_ln_py(x)
        assert _bits(out[i]) == _bits(py), (x, out[i], py)
        assert _bits(dd[i]) == _bits(py), (x, dd[i], py)
        # accuracy vs libm
        t = math.log(x)
        if t != 0.0:
            assert abs(py - t) <= 1e-12 * abs(t) + 1e-300, (x, py, t)


def test_det_exp_bit_identity_spark_duckdb_python(spark):
    xs = _exp_grid()
    sdf = spark.createDataFrame([(i, x) for i, x in enumerate(xs)], "i long, x double")
    out = {r["i"]: r["y"] for r in
           with_det_exp(sdf, "y", F.col("x")).collect()}
    con = duckdb.connect()
    import pandas as pd
    con.register("t", pd.DataFrame({"i": range(len(xs)), "x": xs}))
    dd = dict(con.execute(
        "SELECT i, y FROM (" + det_exp_sql("SELECT * FROM t", "x", "y") + ")"
    ).fetchall())
    for i, x in enumerate(xs):
        py = det_exp_py(x)
        assert _bits(out[i]) == _bits(py), (x, out[i], py)
        assert _bits(dd[i]) == _bits(py), (x, dd[i], py)
        t = math.exp(x)
        assert abs(py - t) <= 1e-12 * t, (x, py, t)


def test_det_ln_domain_nulls(spark):
    xs = [0.0, -1.0, -2.0 ** -64, 2.0 ** 64, 2.0 ** 70, 1e-18]
    sdf = spark.createDataFrame([(i, x) for i, x in enumerate(xs)], "i long, x double")
    out = {r["i"]: r["y"] for r in with_det_ln(sdf, "y", F.col("x")).collect()}
    assert out[0] is None and out[1] is None and out[2] is None
    assert out[3] is None and out[4] is None
    assert out[5] is not None  # in-domain small


def test_det_exp_domain_nulls(spark):
    sdf = spark.createDataFrame([(0, 701.0), (1, -701.0), (2, 0.0)],
                                "i long, x double")
    out = {r["i"]: r["y"] for r in with_det_exp(sdf, "y", F.col("x")).collect()}
    assert out[0] is None and out[1] is None and out[2] == 1.0


def test_floor_log2_exactness(spark):
    ns = [1, 2, 3, 4, 7, 8, 1023, 1024, 1025, 2 ** 40 - 1, 2 ** 40, 2 ** 62 - 1]
    sdf = spark.createDataFrame([(n,) for n in ns], "n long")
    got = {r["n"]: r["b"] for r in
           sdf.select("n", floor_log2_long(F.col("n")).alias("b")).collect()}
    con = duckdb.connect()
    for n in ns:
        want = n.bit_length() - 1
        assert got[n] == want, (n, got[n], want)
        dd = con.execute(f"SELECT {floor_log2_sql(str(n))}").fetchone()[0]
        assert dd == want, (n, dd, want)


def test_benford_expected_shared_literals(spark):
    sdf = spark.createDataFrame([(d,) for d in range(1, 10)], "d int")
    got = {r["d"]: r["e"] for r in
           sdf.select("d", benford_expected_col(F.col("d")).alias("e")).collect()}
    con = duckdb.connect()
    for d in range(1, 10):
        want = math.log10(1 + 1 / d)
        assert _bits(got[d]) == _bits(want)
        dd = con.execute(f"SELECT {benford_expected_sql(str(d))}").fetchone()[0]
        assert _bits(dd) == _bits(want)


def test_perturb_hook_moves_spark_only(spark):
    """The ±1ulp robustness hook must shift the Spark result by exactly
    one ulp-scale factor and leave SQL/Python untouched."""
    sdf = spark.createDataFrame([(0, 0.123456)], "i long, x double")
    base = with_det_ln(sdf, "y", F.col("x")).collect()[0]["y"]
    detmath.PERTURB_ULPS = 1
    try:
        up = with_det_ln(sdf, "y", F.col("x")).collect()[0]["y"]
    finally:
        detmath.PERTURB_ULPS = 0
    assert up == base * (1.0 + 2.0 ** -52)
    assert up != base
    assert _bits(det_ln_py(0.123456)) == _bits(base)


def test_staged_plan_stays_compact(spark):
    """Guard against CollapseProject re-inlining the ladder into one
    exponential expression: the optimized plan string for a det_ln
    projection must stay far below the single-expression blowup size."""
    sdf = spark.range(10).select(
        (F.col("id").cast("double") / 7.0 + 0.1).alias("x"))
    df = with_det_ln(sdf, "y", F.col("x"))
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert len(plan) < 200_000, len(plan)


def test_no_raw_transcendentals_in_oracle_sql():
    """Regression lint for the r11/r12 driver-red class: no oracle SQL
    may compute ln/exp/log/log2/log10 engine-locally — every
    data-dependent transcendental must route through detmath's
    det_ln_sql/det_exp_sql (pure IEEE arithmetic) or a shared-literal
    table. A new query that reintroduces a raw call fails here before
    it can flake at the driver."""
    import re
    import __spark_entry__ as E

    pat = re.compile(
        r"(?<![a-z_])(ln|exp|log|log2|log10|pow|power)\s*\(", re.I
    )
    offenders = {
        name: sorted({m.group(1) for m in pat.finditer(sql)})
        for name, sql in E.oracle_sql().items()
        if pat.search(sql)
    }
    assert offenders == {}, offenders


def test_det_pow_int_bit_identity(spark):
    """Binary exponentiation over shared literals: Spark, DuckDB, and
    a Python fold produce bit-identical doubles, close to libm pow."""
    from v3io_tsdb_spark.functions.detmath import (
        _pow2_table,
        det_pow_int,
        det_pow_int_sql,
    )

    cases = [(0.7, i) for i in range(0, 40)] + [
        (1.0 / 0.7, i) for i in range(0, 40)
    ] + [(0.3, 7), (0.99, 1023), (1.5, 100)]
    for base, i in cases:
        sdf = spark.createDataFrame([(i,)], "i long")
        got = sdf.select(
            det_pow_int(base, F.col("i")).alias("y")
        ).collect()[0]["y"]
        dd = duckdb.connect().execute(
            f"SELECT {det_pow_int_sql(base, str(i))}"
        ).fetchone()[0]
        acc = 1.0
        for j, bj in enumerate(_pow2_table(base, 20)):
            if (i >> j) & 1:
                acc = acc * bj
        assert _bits(got) == _bits(acc), (base, i, got, acc)
        assert _bits(dd) == _bits(acc), (base, i, dd, acc)
        want = base ** i
        if want != 0.0:
            assert abs(acc - want) <= 1e-12 * abs(want), (base, i)


def test_q6_ratio_three_emitter_agreement(spark):
    """Exact-integer 6dp ratio quantization (VERDICT r13 #1b): the
    Spark `div` expression, the DuckDB `//` expression, and the Python
    `//` twin select the identical integer on identical (num, den) —
    including exact .5 boundaries (s even) where three engine-native
    round() implementations could legitimately disagree."""
    from v3io_tsdb_spark.functions.detmath import (
        q6_ratio_col, q6_ratio_py, q6_ratio_sql)

    random.seed(13)
    cases = [(1, 2), (1, 4), (3, 2000000), (1, 3), (2, 3),
             (999999, 1000000), (1, 1000000), (1, 4000000)]
    for _ in range(200):
        den = random.randint(1, 10**7)
        cases.append((random.randint(1, den), den))
    sdf = spark.createDataFrame(cases, "c long, s long")
    got = [r["q"] for r in
           sdf.select(q6_ratio_col("c", "s").alias("q")).collect()]
    con = duckdb.connect()
    for (c, s), g in zip(cases, got):
        py = q6_ratio_py(c, s)
        dk = con.execute(
            f"SELECT {q6_ratio_sql(str(c), str(s), 'duck')}"
        ).fetchone()[0]
        assert g == py == dk, (c, s, g, py, dk)
        # half-up semantics: |q/1e6 - c/s| <= 0.5e-6 with ties up
        assert abs(py - c * 1e6 / s) <= 0.5000001, (c, s)


def test_half_away_div_three_emitter_agreement(spark):
    """Integer mean quantization: Spark/DuckDB/Python agree on
    nearest-integer s/n with halves AWAY from zero, both signs,
    including the exact x.5 micro-nat boundaries (s odd, n even) that
    red-flagged the perplexity family three driver rounds running."""
    from v3io_tsdb_spark.functions.detmath import (
        half_away_div_col, half_away_div_py, half_away_div_sql)

    random.seed(14)
    cases = [(3, 2), (-3, 2), (1, 2), (-1, 2), (0, 5), (7, 1),
             (-13815511, 2), (5, 4), (-5, 4)]
    for _ in range(200):
        cases.append((random.randint(-10**9, 10**9),
                      random.randint(1, 10**4)))
    sdf = spark.createDataFrame(cases, "s long, n long")
    got = [r["q"] for r in
           sdf.select(half_away_div_col("s", "n").alias("q")).collect()]
    con = duckdb.connect()
    for (s, n), g in zip(cases, got):
        py = half_away_div_py(s, n)
        dk = con.execute(
            f"SELECT {half_away_div_sql(str(s), str(n), 'duck')}"
        ).fetchone()[0]
        assert g == py == dk, (s, n, g, py, dk)
        assert abs(py - s / n) <= 0.5 + 1e-9, (s, n, py)
    assert half_away_div_py(3, 2) == 2      # +1.5 -> +2 (away)
    assert half_away_div_py(-3, 2) == -2    # -1.5 -> -2 (away)


def test_quantize_micro_py_matches_spark_floor_form(spark):
    """quantize_micro_py is the Python twin of text.quantize_half_away
    (divided back to value scale) — the stream twins' shared quantizer
    (VERDICT r13 #6)."""
    from v3io_tsdb_spark.functions.detmath import quantize_micro_py
    from v3io_tsdb_spark.functions.text import quantize_half_away

    random.seed(15)
    vals = [0.1234565, -0.1234565, 1.5e-7, -1.5e-7, 0.0, 2.5, -2.5]
    vals += [random.uniform(-100, 100) for _ in range(100)]
    sdf = spark.createDataFrame([(v,) for v in vals], "x double")
    got = [r["q"] for r in
           sdf.select(quantize_half_away(F.col("x") * F.lit(1e6))
                      .alias("q")).collect()]
    for v, g in zip(vals, got):
        assert _bits(quantize_micro_py(v)) == _bits(g / 1e6), (v, g)
