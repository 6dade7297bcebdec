"""A22/A23: stdin/stdout byte streaming and program pipes — the
reference spools these through a temp fd (uri_utils.rs:43-76); the
Spark equivalent mirrors that shape."""

import io

from pg_parquet_spark.sources.pipe import (
    copy_from_program,
    copy_from_stream,
    copy_to_program,
    copy_to_stream,
)


def _frame(spark):
    return spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", -2.0), (3, None, 0.0)],
        "id INT, name STRING, score DOUBLE",
    )


def test_stream_roundtrip(spark):
    buf = io.BytesIO()
    n = copy_to_stream(_frame(spark), buf)
    assert n == buf.tell() and n > 0
    assert buf.getvalue()[:4] == b"PAR1"  # it's a real parquet file

    buf.seek(0)
    back = copy_from_stream(spark, buf)
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, _frame(spark).collect())
    )


def test_stream_honors_write_options(spark):
    import pyarrow.parquet as pq

    buf = io.BytesIO()
    copy_to_stream(_frame(spark), buf, compression="zstd", row_group_size=2)
    buf.seek(0)
    pf = pq.ParquetFile(buf)
    assert pf.metadata.num_row_groups == 2  # 3 rows, cap 2
    assert pf.metadata.row_group(0).column(0).compression == "ZSTD"


def test_program_pipe_roundtrip(spark, tmp_path):
    target = tmp_path / "piped.parquet"
    n = copy_to_program(_frame(spark), f"cat > {target}")
    assert target.stat().st_size == n

    back = copy_from_program(spark, f"cat {target}")
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, _frame(spark).collect())
    )


def test_program_failure_raises(spark):
    import pytest

    with pytest.raises(RuntimeError, match="status"):
        copy_to_program(_frame(spark), "exit 3")
    with pytest.raises(RuntimeError, match="status"):
        copy_from_program(spark, "exit 5")


def test_from_stream_where_and_columns(spark):
    buf = io.BytesIO()
    copy_to_stream(_frame(spark), buf)
    buf.seek(0)
    sub = copy_from_stream(spark, buf, columns=["id"], where="id >= 2")
    assert sorted(r.id for r in sub.collect()) == [2, 3]
