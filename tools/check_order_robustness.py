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
    import __spark_entry__ as E
    from v3io_tsdb_spark.functions import detmath

    qs = E.queries()
    failures = 0
    results = {}
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        frames = []
        err = None
        det_before = detmath.BUILD_COUNT
        for parts, split_bytes in PASSES:
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            spark.conf.set("spark.sql.files.maxPartitionBytes", split_bytes)
            try:
                frames.append(norm(fn(spark, SF).toPandas()))
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
                except Exception as exc:  # noqa: BLE001
                    err = f"perturb {ulps:+d}: {type(exc).__name__}: {str(exc)[:160]}"
                    break
                finally:
                    detmath.PERTURB_ULPS = 0
            if err is not None:
                print(f"FAIL {name}: {err}")
                results[name] = {"order_invariant": False, "err": err}
                failures += 1
                continue
        a = frames[0]
        bad = None
        for i, b in enumerate(frames[1:], 1):
            tag = ("32-part" if i == 1
                   else f"ulp{+1 if i == 2 else -1:+d}")
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
            extra = " + ±1ulp" if uses_det else ""
            print(f"PASS {name}: {len(a)} rows invariant across "
                  f"1/32 partitions{extra}")
            results[name] = {
                "order_invariant": True, "err": None,
                "ulp_checked": bool(uses_det),
            }
    # restore the session defaults for any caller sharing the JVM
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "134217728")
    print("FAILURES:", failures)
    if JSON_OUT:
        import json

        with open(JSON_OUT, "w") as f:
            json.dump(results, f, indent=1)
        print(f"wrote {JSON_OUT} ({len(results)} queries)")
    return failures


if __name__ == "__main__":
    raise SystemExit(1 if main() else 0)
