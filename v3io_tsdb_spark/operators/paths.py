"""Session path mining: the top event-type sequences users actually
walk.

The funnel operator (operators/funnel.py) checks ONE declared step
sequence; path mining inverts the question — which n-step sequences
occur most, discovered from the data. The classic clickstream
"top paths" panel, and at training-pipeline scale the screen for
degenerate interaction loops (bot traffic shows as a single dominant
path).

Semantics: events are sessionized per user with an inactivity gap
(same rule as operators/sessions.py, ref's windows have no session
concept — SURVEY §2 ST6 extension); within each session, every run of
``n`` CONSECUTIVE events forms one path occurrence (overlapping runs
count — the n-gram convention, matching the text side's shingles).
Event order is the total order (ts, type, id) so equal-timestamp
bursts mine deterministically in both engines.

Plan shape at 100 TB: ONE user-keyed exchange serves the sessionize
window AND the within-session lead windows (hash(user) already
clusters (user, session) — EnsureRequirements inserts only a sort, no
second exchange); the path aggregate is partial-aggregable on
path-sized keys (bounded by |event types|^n, not data), and the
global top-k is TakeOrdered (per-partition heaps), never a full sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def session_path_ngrams(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts_ms",
    type_col: str = "event_type",
    id_col: str = "event_id",
    gap_ms: int = 1_800_000,
    n: int = 3,
    k: int = 20,
) -> DataFrame:
    """Top-``k`` ``n``-step event-type paths within inactivity-gap
    sessions: ``(path, occurrences, rank)``, ranked by count desc with
    path asc as the deterministic tiebreak."""
    order = [F.col(ts_col), F.col(type_col), F.col(id_col)]
    wu = Window.partitionBy(user_col).orderBy(*order)
    new_sess = (
        F.col(ts_col) - F.lag(ts_col).over(wu) > gap_ms
    ).cast("long")
    s = df.withColumn(
        "_sess", F.sum(F.coalesce(new_sess, F.lit(1))).over(wu)
    )
    ws = Window.partitionBy(user_col, "_sess").orderBy(*order)
    steps = [F.col(type_col)] + [
        F.lead(type_col, i).over(ws) for i in range(1, n)
    ]
    paths = (
        s.withColumn("_last", F.lead(type_col, n - 1).over(ws))
        .withColumn("_path", F.concat_ws(">", *steps))
        .where(F.col("_last").isNotNull())
    )
    counted = paths.groupBy(F.col("_path").alias("path")).agg(
        F.count("*").cast("long").alias("occurrences")
    )
    top = counted.orderBy(F.col("occurrences").desc(), "path").limit(k)
    wr = Window.orderBy(F.col("occurrences").desc(), "path")
    return top.withColumn("rank", F.row_number().over(wr).cast("long"))
