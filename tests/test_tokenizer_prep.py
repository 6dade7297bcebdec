"""Tokenizer-prep operators (vocab induction, BPE pair statistics):
oracle equality at both SFs and hand-checkable toy semantics."""

import duckdb
import pytest

from pg_parquet_spark.operators import text
from pg_parquet_spark.session import table

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


def _con(sf):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    return con


@pytest.mark.parametrize("sf", SFS)
def test_vocab_matches_duckdb_oracle(spark, sf):
    docs = table(spark, sf, "documents")
    got = text.vocab_top_terms(docs, top_k=40).toPandas()
    want = _con(sf).execute(text.vocab_oracle_sql(top_k=40)).df()
    assert len(got) == len(want) > 0
    assert list(got["term"]) == list(want["term"])
    assert list(got["n"]) == list(want["n"])


@pytest.mark.parametrize("sf", SFS)
def test_bpe_pairs_match_duckdb_oracle(spark, sf):
    docs = table(spark, sf, "documents")
    got = text.bpe_pair_counts(docs, top_k=40).toPandas()
    want = _con(sf).execute(text.bpe_pair_oracle_sql(top_k=40)).df()
    assert len(got) == len(want) > 0
    assert list(got["pair"]) == list(want["pair"])
    assert list(got["n"]) == list(want["n"])


def test_toy_semantics(spark):
    df = spark.createDataFrame(
        [("a b a b c",), ("a b x",), ("z",)], "text string"
    )
    vocab = text.vocab_top_terms(df, top_k=10).toPandas()
    assert list(vocab["term"])[:2] == ["a", "b"]  # 3 each, tie → alpha
    assert list(vocab["n"])[:2] == [3, 3]
    pairs = text.bpe_pair_counts(df, top_k=10).toPandas()
    assert pairs.iloc[0]["pair"] == "a b" and pairs.iloc[0]["n"] == 3
    # single-token row contributes no pair
    assert "z" not in " ".join(pairs["pair"])
