"""BPE induction at production merge counts (round-10 verdict Next #2).

The driver corpus cannot exercise the merge budget: its synthetic
documents use 31 distinct words, so sum(len(w) - 1) = 107 word-internal
merges exist in total (measured; the module comment in operators/text.py
records it). This test builds a crafted 2.5k-word corpus with real merge
headroom and proves the delta-maintained loop (a) consumes >= 512 merges
and (b) still matches the DuckDB full-recount oracle bit-for-bit at that
depth — delta maintenance is exact, so a recount replay must agree at
ANY number of levels.
"""

from __future__ import annotations

import random
import string

import duckdb
import pytest

from datafusion_loki_spark.operators.text import (
    _bpe_train,
    _oracle_bpe_sql,
    text_bpe_vocab,
)
from tests.parity import compare

_SCALE_ITERS = 40  # early rounds fill below BPE_BATCH (letter-disjointness
# caps symbol-disjoint rules over a 26-letter alphabet); later rounds fill
# as fused symbols diversify — 40 rounds gives comfortable headroom
# over the 512-merge bar


@pytest.fixture(scope="module")
def crafted_dir(spark, tmp_path_factory):
    rng = random.Random(11)
    words = sorted(
        {
            "".join(
                rng.choice(string.ascii_lowercase)
                for _ in range(rng.randint(5, 10))
            )
            for _ in range(2600)
        }
    )
    rows = []
    for i in range(4000):
        n = rng.randint(20, 40)
        # quadratic skew: early-sorted words dominate, giving the pair
        # distribution the Zipf-ish head real corpora have
        text = " ".join(
            words[int(len(words) * rng.random() ** 2)] for _ in range(n)
        )
        rows.append((i, text))
    d = str(tmp_path_factory.mktemp("bpe_scale"))
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(f"{d}/documents.parquet")
    return d


def test_bpe_budget_consumed_and_oracle_exact_at_depth(spark, crafted_dir):
    df = text_bpe_vocab(spark, crafted_dir, iters=_SCALE_ITERS)
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM"
        f" read_parquet('{crafted_dir}/documents.parquet/*.parquet')"
    )
    ok, msg = compare(df, _oracle_bpe_sql(iters=_SCALE_ITERS), con)
    assert ok, msg
    n = df.count()
    assert n >= 512, f"only {n} merges selected at {_SCALE_ITERS} rounds"


def test_bpe_early_stop_is_exact(spark, crafted_dir):
    # a tiny 2-word corpus exhausts in a handful of rounds; the loop must
    # BREAK (fewer batch frames than the budget) and still match a
    # full-depth oracle replay, whose post-exhaustion levels are carries
    rows = [(i, "alpha beta alpha") for i in range(30)]
    d = crafted_dir + "/tiny"
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(f"{d}/documents.parquet")
    batches, _vocab = _bpe_train(spark, d, iters=12)
    assert len(batches) < 12, "loop did not early-stop on exhaustion"
    df = text_bpe_vocab(spark, d, iters=12)
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM"
        f" read_parquet('{d}/documents.parquet/*.parquet')"
    )
    ok, msg = compare(df, _oracle_bpe_sql(iters=12), con)
    assert ok, msg
    # 'alpha' and 'beta' fully fuse: 4 + 3 internal merges
    assert df.count() == 7
