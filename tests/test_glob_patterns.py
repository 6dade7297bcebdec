"""Glob-pattern edge cases (reference: src/pgrx_tests/copy_pattern.rs:9-77
— non-parquet files in the pattern's directory, special filenames,
nonexistent patterns) + hook-dispatch parity (A3)."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pg_parquet_spark.sources import read_parquet
from pg_parquet_spark.sources.options import OptionError
from pg_parquet_spark.sources.writer import copy_to


def test_glob_skips_non_matching_files(spark, tmp_path):
    pq.write_table(pa.table({"a": pa.array([1])}), str(tmp_path / "one.parquet"))
    pq.write_table(pa.table({"a": pa.array([2])}), str(tmp_path / "two.parquet"))
    (tmp_path / "notes.txt").write_text("not parquet")
    df = read_parquet(spark, str(tmp_path / "*.parquet"))
    assert sorted(r.a for r in df.collect()) == [1, 2]


def test_glob_special_filenames(spark, tmp_path):
    # special chars in names (copy_pattern.rs special filenames)
    for name in ("a b.parquet", "x-y_z.1.parquet"):
        pq.write_table(pa.table({"a": pa.array([7])}), str(tmp_path / name))
    df = read_parquet(spark, str(tmp_path / "*.parquet"))
    assert df.count() == 2


def test_glob_nonexistent_pattern_errors(spark, tmp_path):
    with pytest.raises(FileNotFoundError, match="no files found"):
        read_parquet(spark, str(tmp_path / "missing" / "**" / "*.parquet"))


def test_recursive_glob(spark, tmp_path):
    (tmp_path / "y=1").mkdir()
    (tmp_path / "y=2").mkdir()
    pq.write_table(pa.table({"a": pa.array([1])}), str(tmp_path / "y=1" / "f.parquet"))
    pq.write_table(pa.table({"a": pa.array([2])}), str(tmp_path / "y=2" / "f.parquet"))
    df = read_parquet(spark, str(tmp_path / "*" / "*.parquet"))
    assert sorted(r.a for r in df.collect()) == [1, 2]


def test_copy_to_refuses_non_parquet_uri(spark):
    # hook engages only for parquet targets (copy_utils.rs:430-515)
    df = spark.range(1)
    with pytest.raises(OptionError, match="not a parquet target"):
        copy_to(df, "/tmp/out.csv")


def test_copy_to_format_option_engages(spark, tmp_path):
    # `format parquet` engages the hook for any extension
    df = spark.range(3).selectExpr("id AS a")
    path = str(tmp_path / "data.bin")
    copy_to(df, path, format="parquet")
    back = read_parquet(spark, path)
    assert back.count() == 3


def test_deep_doublestar_glob_reaches_nested_files(spark, tmp_path):
    # '**' must match files ≥2 levels deep (glob-crate semantics); Hadoop
    # treats '**' like '*', so the reader expands local patterns itself
    deep = tmp_path / "a" / "b" / "c"
    deep.mkdir(parents=True)
    pq.write_table(pa.table({"a": pa.array([1])}), str(tmp_path / "top.parquet"))
    pq.write_table(pa.table({"a": pa.array([2])}), str(deep / "deep.parquet"))
    df = read_parquet(spark, str(tmp_path / "**" / "*.parquet"))
    assert sorted(r.a for r in df.collect()) == [1, 2]


def test_relative_glob_anchors_to_cwd(spark, tmp_path, monkeypatch):
    # ADVICE r2: a relative pattern fell back to base '/', walked the
    # whole fs, matched nothing, and raised FileNotFoundError
    pq.write_table(pa.table({"a": pa.array([9])}), str(tmp_path / "rel.parquet"))
    monkeypatch.chdir(tmp_path)
    df = read_parquet(spark, "*.parquet")
    assert [r.a for r in df.collect()] == [9]


def test_doublestar_is_segment_anchored(tmp_path):
    # ADVICE r2: 'a/**/b' must NOT match 'a/xb'; '[!...]' negates
    from pg_parquet_spark.sources.fs import _glob_regex

    rx = _glob_regex("a/**/b.parquet")
    assert rx.match("a/b.parquet")
    assert rx.match("a/x/y/b.parquet")
    assert not rx.match("a/xb.parquet")
    neg = _glob_regex("data_[!0-9].parquet")
    assert neg.match("data_x.parquet")
    assert not neg.match("data_5.parquet")


def test_class_members_are_glob_literal(tmp_path):
    # ADVICE r3 #3: class members must be escaped individually — the
    # degenerate '[!]' used to compile to the invalid regex '[^]', and
    # regex-special members kept Python-regex semantics
    from pg_parquet_spark.sources.fs import _glob_regex

    lit = _glob_regex("a[!]b")  # no members: matches the literal text
    assert lit.match("a[!]b") and not lit.match("axb")
    first = _glob_regex("x[]ab]y")  # ']' first in a class is literal
    assert first.match("x]y") and first.match("xay") and not first.match("xcy")
    bs = _glob_regex("a[\\d]b")  # backslash is a literal member, not \d
    assert bs.match("a\\b") and bs.match("adb") and not bs.match("a5b")
    rng = _glob_regex("f[a-c]g")  # ranges keep range semantics
    assert rng.match("fbg") and not rng.match("fdg")
    # ADVICE r4: ']' right after '[!' is a literal member of the negated
    # class (glob crate requires ≥1 member after '!'), not the closer
    negfirst = _glob_regex("x[!]ab]y")
    assert negfirst.match("xcy")
    assert not negfirst.match("xay") and not negfirst.match("x]y")
