"""Unit tests for the data-quality constraint report — injected
violations must be counted exactly, and the report is one job."""

from __future__ import annotations

from pyspark.sql import functions as F

from mlops_realtime_data_ingestion_spark.operators.dq import constraint_report


def test_constraint_report_counts_injected_violations(spark):
    df = spark.createDataFrame(
        [
            (1, 10.0, "A"),
            (2, -5.0, "A"),    # range violation
            (3, 0.0, "B"),     # range violation (<= 0)
            (3, 7.0, None),    # dup id + null status
            (5, 3.0, "C"),     # domain violation
        ],
        "id long, amount double, status string",
    )
    out = constraint_report(
        df,
        violations={
            "amount_positive": F.col("amount") <= 0,
            "status_not_null": F.col("status").isNull(),
            "status_in_domain": ~F.col("status").isin("A", "B"),
        },
        unique_keys={"id_unique": "id"},
    ).collect()
    got = {r.check_name: (r.n_rows, r.n_violations, r.ok) for r in out}
    assert got["amount_positive"] == (5, 2, False)
    assert got["status_not_null"] == (5, 1, False)
    # NULL status is not a domain violation (predicate is null there)
    assert got["status_in_domain"] == (5, 1, False)
    assert got["id_unique"] == (5, 1, False)


def test_pii_redact_on_crafted_pii(spark):
    from mlops_realtime_data_ingestion_spark.operators.text import pii_redact

    df = spark.createDataFrame(
        [
            (1, "contact john.doe+x@example.co.uk or call 12345678 now"),
            (2, "short digits 123456 stay; account 9876543210 goes"),
            (3, "no pii at all"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in pii_redact(df).collect()}
    assert got[1].n_emails == 1 and got[1].n_numbers == 1
    assert "<EMAIL>" in got[1].redacted and "<NUM>" in got[1].redacted
    assert "example" not in got[1].redacted and "12345678" not in got[1].redacted
    # 6-digit run is below the 7+ threshold and survives
    assert got[2].n_numbers == 1 and "123456" in got[2].redacted
    assert "9876543210" not in got[2].redacted
    assert got[3].n_emails == 0 and got[3].n_numbers == 0
    assert got[3].redacted == "no pii at all"


def test_constraint_report_all_ok(spark):
    df = spark.createDataFrame([(1, 1.0), (2, 2.0)], "id long, v double")
    out = constraint_report(
        df,
        violations={"v_positive": F.col("v") <= 0},
        unique_keys={"id_unique": "id"},
    ).collect()
    assert all(r.ok and r.n_violations == 0 for r in out)
