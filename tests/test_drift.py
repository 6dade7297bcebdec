"""PSI drift monitoring: oracle equality (categorical + bucketized
numeric) at both SFs, exact-zero self-drift, and direction sanity."""

import duckdb
import pytest
from pyspark.sql import functions as F

from pg_parquet_spark.operators import drift
from pg_parquet_spark.session import table

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]

COLS = ["category", "c_ref", "c_new", "q_ppm", "p_ppm", "lr_micro", "term"]


def _con(sf):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    return con


@pytest.mark.parametrize("sf", SFS)
def test_categorical_psi_matches_oracle(spark, sf):
    docs = table(spark, sf, "documents")
    ref = docs
    new = docs.filter("n_chars % 3 != 0")  # shifts the source mix
    got = drift.psi_table(ref, new, F.col("source")).toPandas()
    want = _con(sf).execute(
        drift.psi_oracle_sql(
            "SELECT * FROM documents",
            "SELECT * FROM documents WHERE n_chars % 3 != 0",
            "source",
        )
    ).df()
    assert len(got) == len(want) > 0
    for col in COLS:
        assert list(got[col]) == list(want[col]), col


@pytest.mark.parametrize("sf", SFS)
def test_numeric_psi_matches_oracle(spark, sf):
    docs = table(spark, sf, "documents")
    ref = docs
    new = docs.filter("doc_id % 2 = 0")
    edges = [200.0, 400.0, 600.0, 800.0]
    got = drift.psi_table(
        ref, new, drift.bucketize(F.col("n_chars").cast("double"), edges)
    ).toPandas()
    want = _con(sf).execute(
        drift.psi_oracle_sql(
            "SELECT * FROM documents",
            "SELECT * FROM documents WHERE doc_id % 2 = 0",
            drift.bucketize_sql("CAST(n_chars AS DOUBLE)", edges),
        )
    ).df()
    assert len(got) == len(want) > 0
    for col in COLS:
        assert list(got[col]) == list(want[col]), col


def test_self_drift_is_exactly_zero_and_shift_is_loud(spark):
    docs = table(spark, SFS[1], "documents")
    same = drift.psi_table(docs, docs, F.col("source"))
    assert drift.psi_total(same) == 0  # identical args → identical terms
    # a hard shift (drop half the sources) must cross the 0.25 alarm
    shifted = docs.filter("source >= 'src10'")
    t = drift.psi_table(docs, shifted, F.col("source"))
    assert drift.psi_total(t) / 1e12 > 0.25
