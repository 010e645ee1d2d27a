"""Training-data materialization (SURVEY.md §2.1 S13-S15, §2.2 P7,
§7 step 6): the reference's DeepAR dataset serialization and
evaluation-report emission as DataFrame plans + distributed sinks.

Reference parity:
- S13 DeepAR JSONL: ``[{"start": ts, "target": [...]}]`` one JSON per
  line (preprocess.py:31-35,160-164; data_collection/utils.py:151-155).
- P7 NaN encoding: non-finite target values serialize as the literal
  string "NaN" (data_collection/utils.py:124-125).
- S14 CSV sink with header (preprocess.py:165-167; evaluate.py:106-108).
- S15 JSON metrics report (evaluate.py:109-110).
- W1/W2 splits feed these — operators/timeseries.py.

Scale: serialization happens executor-side (``to_json`` over the
gathered series struct); a 100 TB corpus writes one JSONL shard per
partition. The reference's pandas version materialized the whole
series on one box.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["nan_encode", "deepar_records", "write_deepar_jsonl", "write_csv", "write_json_report"]


def nan_encode(value: Column) -> Column:
    """P7: non-finite -> literal "NaN" string, else the number
    rendered as-is (JSON-safe for DeepAR)."""
    return F.when(
        F.isnan(value) | value.isNull(), F.lit("NaN")
    ).otherwise(value.cast("string"))


def deepar_records(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    series_cols: list[str] | None = None,
    freq_seconds: int = 60,
) -> DataFrame:
    """One DeepAR record per series: {"start": first timestamp,
    "target": [...]} with NaN-encoded gaps.

    The target array is the event-time-ordered value series
    (sort_array(collect_list(struct)) — bounded by series length, the
    A8 contract).
    """
    series_cols = series_cols or []
    packed = F.struct(F.col(ts_col).alias("__ts"), F.col(value_col).alias("__v"))
    gathered = df.groupBy(*series_cols).agg(
        F.sort_array(F.collect_list(packed)).alias("__series")
    )
    return gathered.select(
        *series_cols,
        F.date_format(
            F.col("__series")[0]["__ts"], "yyyy-MM-dd HH:mm:ss"
        ).alias("start"),
        F.transform(F.col("__series"), lambda s: s["__v"]).alias("target"),
    )


def write_deepar_jsonl(records: DataFrame, path: str, num_shards: int | None = None) -> None:
    """S13: serialize records to JSON-lines. NaN targets are encoded
    as the string "NaN" inside the array (P7), matching the
    reference's json.dumps of a pandas series with NaN->"NaN"."""
    jsonified = records.select(
        F.to_json(
            F.struct(
                F.col("start"),
                F.transform(F.col("target"), nan_encode).alias("target"),
            )
        ).alias("value")
    )
    if num_shards:
        jsonified = jsonified.coalesce(num_shards)
    jsonified.write.mode("overwrite").text(path)


def write_csv(df: DataFrame, path: str, num_shards: int | None = None) -> None:
    """S14: CSV with header."""
    out = df.coalesce(num_shards) if num_shards else df
    out.write.mode("overwrite").option("header", True).csv(path)


def write_json_report(df: DataFrame, path: str) -> None:
    """S15: one-row metrics report as a single JSON file part."""
    df.coalesce(1).write.mode("overwrite").json(path)
