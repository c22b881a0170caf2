"""Output formatters — text / csv / json, per the reference's
formatter registry (ref: pkg/formatter/type.go:33-50,
formatters.go:38-196: text, csv, json (Grafana-style list of
{target, datapoints}), and a count-only "none").
"""

from __future__ import annotations

import io
import json

from pyspark.sql import DataFrame

from v3io_tsdb_spark.errors import BadRequest
from v3io_tsdb_spark.labels import labels_to_string

FORMATS = ("text", "csv", "json", "none")


def format_df(df: DataFrame, kind: str = "text", max_rows: int = 10_000) -> str:
    kind = (kind or "text").lower()
    if kind == "none":
        return f"{df.count()} rows\n"
    rows = df.limit(max_rows).collect()
    cols = df.columns
    if kind == "text":
        return df.limit(max_rows)._show_string(max_rows, 40, False)
    if kind == "csv":
        buf = io.StringIO()
        buf.write(",".join(cols) + "\n")
        for r in rows:
            buf.write(",".join(_csv_cell(r[c]) for c in cols) + "\n")
        return buf.getvalue()
    if kind == "json":
        return _grafana_json(rows, cols)
    raise BadRequest(f"unknown format {kind!r}; supported: {FORMATS}")


def _csv_cell(v) -> str:
    if v is None:
        return ""
    if isinstance(v, dict):
        v = labels_to_string(v)
    s = str(v)
    if "," in s or '"' in s or "\n" in s:
        s = '"' + s.replace('"', '""') + '"'
    return s


def _grafana_json(rows, cols) -> str:
    """Series-shaped results → [{target, datapoints: [[v, t], ...]}];
    other shapes → plain records. ref: pkg/formatter/formatters.go
    (jsonFormatter)."""
    t_col = "t" if "t" in cols else ("time" if "time" in cols else None)
    if t_col and "value" in cols and "name" in cols:
        series = {}
        for r in rows:
            labels = r["labels"] if "labels" in cols and r["labels"] else {}
            target = r["name"] + ("{" + labels_to_string(labels) + "}" if labels else "")
            # variant (string-valued) series carry their sample in
            # value_str; the reference's formatter emits the variant
            # string as the datapoint value (pkg/formatter uses the
            # iterator's typed value either way)
            v = r["value"]
            if v is None and "value_str" in cols:
                v = r["value_str"]
            series.setdefault(target, []).append([v, r[t_col]])
        return json.dumps(
            [{"target": k, "datapoints": v} for k, v in sorted(series.items())], indent=2
        )
    out = []
    for r in rows:
        d = r.asDict(recursive=True)
        out.append(d)
    return json.dumps(out, indent=2, default=str)
