"""Order-robustness harness (VERDICT r11 #2).

The r11 driver red (`events_session_perplexity`) and the r11 one-shot
gate flake were the same bug class: a 6dp-rounded float sum whose value
depends on partition/engine accumulation order. This harness catches
the class locally: it runs every `__spark_entry__.queries()` entry
TWICE in one SparkSession —

  pass A: spark.sql.shuffle.partitions=1,  maxPartitionBytes=512m
          (one shuffle partition, one input split: a single sequential
          accumulation order), and
  pass B: spark.sql.shuffle.partitions=32, maxPartitionBytes=1m
          (many shuffle partitions, many input splits: maximally
          different partial-aggregation order)

— and requires the two results to be identical under the driver's own
normalization (columns sorted, floats rounded 6dp, rows sorted). A
query whose verdict column survives this is partitioning-invariant on
this host; combined with the exact-integer accumulation discipline
(`functions/text.py::micro_nats`) that also makes it engine-invariant.

LIBM-PERTURBATION passes (VERDICT r12 #1/#2): for every query that
routes through `functions/detmath.py` (detected via its BUILD_COUNT),
two further passes run with ``detmath.PERTURB_ULPS = ±1`` — the det
results are multiplied by (1 ± 2^-52), simulating a 1-ulp libm
disagreement — and the normalized result must STILL match pass A.
This is the local test that would have caught both r11/r12 driver
reds on `events_session_perplexity`: a hash that survives ±1 ulp of
log error cannot flip on a cross-engine ulp at a rounding boundary.

ROUND-BOUNDARY passes (VERDICT r13 #3): for every query whose result
has a float column, two further passes multiply the UNROUNDED value
feeding every engine-native rounding seam by (1 ± 2^-52) — F.round is
monkeypatched for the pass, and text.quantize_half_away consults
``detmath.ROUND_PERTURB_ULPS``. The r13 driver red on
`stream_session_perplexity` was this seam: three round()
implementations (Spark BigDecimal, DuckDB native, Python floor form)
touching a value that lands ON a .5 boundary. A hash that survives
this stage cannot flip on a cross-build rounding disagreement;
exact-integer quantizations (detmath.q6_ratio / half_away_div) have
no float round at all and are unaffected by construction.

Usage:
    python tools/check_order_robustness.py [sf_dir] [query ...]
    python tools/check_order_robustness.py [sf_dir] --json OUT.json

Exit code 0 iff every checked query matches across the two passes.
"""

import sys

sys.path.insert(0, "/root/repo")

import pandas as pd
from pyspark.sql import SparkSession

_args = sys.argv[1:]
JSON_OUT = None
if "--json" in _args:
    i = _args.index("--json")
    JSON_OUT = _args[i + 1]
    _args = _args[:i] + _args[i + 2:]
SF = _args[0] if _args else "/root/testdata/sf0.01"
ONLY = set(_args[1:])

# (shuffle partitions, files.maxPartitionBytes) per pass
PASSES = (("1", "536870912"), ("32", "1048576"))


def norm(df: pd.DataFrame) -> pd.DataFrame:
    """The driver-compare normalization (tools/check_oracle.py): sort
    columns, round floats 6dp, sort rows. Two frames equal under this
    normalization hash identically in the driver's correctness gate."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(6)
    df = df.sort_values(by=list(df.columns), na_position="first").reset_index(
        drop=True
    )
    return df


def main() -> int:
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import pyspark.sql.functions as PF

    import __spark_entry__ as E
    from v3io_tsdb_spark.functions import detmath

    orig_round = PF.round

    def set_round_perturb(ulps: int) -> None:
        """±1 ulp on the unrounded value at EVERY engine-native round
        seam: F.round is patched module-wide (all repo code calls it
        as ``F.round``, resolving this attribute at build time) and
        quantize_half_away consults the detmath flag. F.floor is NOT
        patched — it also implements exact time/width bucketing, where
        boundary values are legitimate and a perturbation would only
        manufacture false positives."""
        detmath.ROUND_PERTURB_ULPS = ulps
        if ulps:
            f = 1.0 + ulps * 2.0 ** -52

            def _perturbed_round(col, scale=0):
                c = PF.col(col) if isinstance(col, str) else col
                return orig_round(c * f, scale)

            PF.round = _perturbed_round
        else:
            PF.round = orig_round

    qs = E.queries()
    failures = 0
    results = {}
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        frames, tags = [], []
        err = None
        det_before = detmath.BUILD_COUNT
        for parts, split_bytes in PASSES:
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            spark.conf.set("spark.sql.files.maxPartitionBytes", split_bytes)
            try:
                frames.append(norm(fn(spark, SF).toPandas()))
                tags.append(f"{parts}-part")
            except Exception as exc:  # noqa: BLE001 - sweep must continue
                err = f"{type(exc).__name__}: {str(exc)[:160]}"
                break
        if err is not None:
            print(f"FAIL {name}: error at {parts} partitions: {err}")
            results[name] = {"order_invariant": False, "err": err}
            failures += 1
            continue
        # ±1ulp libm-perturbation passes, only for detmath-routed queries
        uses_det = detmath.BUILD_COUNT > det_before
        if uses_det:
            for ulps in (1, -1):
                detmath.PERTURB_ULPS = ulps
                try:
                    frames.append(norm(fn(spark, SF).toPandas()))
                    tags.append(f"ulp{ulps:+d}")
                except Exception as exc:  # noqa: BLE001
                    err = f"perturb {ulps:+d}: {type(exc).__name__}: {str(exc)[:160]}"
                    break
                finally:
                    detmath.PERTURB_ULPS = 0
        # round-boundary passes (VERDICT r13 #3), only when a float
        # column is emitted (an all-integer result has no round seam)
        has_float = err is None and any(
            str(t).startswith("float") for t in frames[0].dtypes
        )
        if has_float:
            for ulps in (1, -1):
                set_round_perturb(ulps)
                try:
                    frames.append(norm(fn(spark, SF).toPandas()))
                    tags.append(f"round_ulp{ulps:+d}")
                except Exception as exc:  # noqa: BLE001
                    err = (f"round perturb {ulps:+d}: "
                           f"{type(exc).__name__}: {str(exc)[:160]}")
                    break
                finally:
                    set_round_perturb(0)
        if err is not None:
            print(f"FAIL {name}: {err}")
            results[name] = {"order_invariant": False, "err": err}
            failures += 1
            continue
        a = frames[0]
        bad = None
        for i, b in enumerate(frames[1:], 1):
            tag = tags[i]
            same = (list(a.columns) == list(b.columns)
                    and len(a) == len(b) and a.equals(b))
            if not same:
                bad = (tag, b)
                break
        if bad is not None:
            tag, b = bad
            detail = f"rows {len(a)} vs {len(b)}"
            if list(a.columns) == list(b.columns) and len(a) == len(b):
                for c in a.columns:
                    neq = ~((a[c].isna() & b[c].isna()) | (a[c] == b[c]))
                    if neq.any():
                        i = neq.idxmax()
                        detail = f"col {c}: {a[c][i]!r} vs {b[c][i]!r} ({int(neq.sum())} cells)"
                        break
            print(f"FAIL {name}: sensitive at {tag} — {detail}")
            results[name] = {
                "order_invariant": False, "err": f"{tag}: {detail}"
            }
            failures += 1
        else:
            extra = ("" if len(tags) == 2
                     else " + " + "/".join(tags[2:]))
            print(f"PASS {name}: {len(a)} rows invariant across "
                  f"1/32 partitions{extra}")
            results[name] = {
                "order_invariant": True, "err": None,
                "ulp_checked": bool(uses_det),
                "round_ulp_checked": bool(has_float),
            }
    # restore the session defaults for any caller sharing the JVM
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "134217728")
    print("FAILURES:", failures)
    if JSON_OUT:
        import json

        from bench import engine_versions

        results["_versions"] = engine_versions(spark)  # VERDICT r13 #4
        with open(JSON_OUT, "w") as f:
            json.dump(results, f, indent=1)
        print(f"wrote {JSON_OUT} ({len(results)} queries)")
    return failures


if __name__ == "__main__":
    raise SystemExit(1 if main() else 0)
