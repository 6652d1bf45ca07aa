"""Differential pin for corpus_snapshot_diff's NULL-text contract.

Generation membership must come from the bucket windows, never from
fingerprint nullness (md5(NULL) is NULL — inferring presence from it
would call a prev-only NULL-text doc 'added'), and two NULL-text
generations of the same doc compare as UNCHANGED (null-safe equality on
both engines). The fixtures carry no NULL text, so this crafts a corpus
that exercises every class with and without NULLs and runs the SAME
Spark-vs-DuckDB comparison the driver runs.

doc_id bucket windows (md5 prefix): 6 -> [00,40) prev-only; 9 -> [40,80)
overlap-unchanged; 4 -> [80,c0) overlap-revised; 0 -> [c0,ff] cur-only.
"""

from __future__ import annotations


def test_null_text_statuses_match_oracle(spark, tmp_path):
    import duckdb

    from datafusion_loki_spark.operators.sampling import (
        ORACLE_SNAPSHOT_DIFF,
        corpus_snapshot_diff,
    )
    from tests.parity import compare

    rows = [
        # one normal doc per status class
        (6, "doc six text", "en", "web", 12),     # removed
        (9, "doc nine text", "en", "web", 13),    # unchanged
        (4, "doc four text", "en", "web", 13),    # changed (revised slice)
        (0, "doc zero text", "en", "web", 13),    # added
        # NULL-text docs in each membership shape
        (19, None, "en", "web", 0),               # prev-only NULL -> removed
        (11, None, "en", "web", 0),               # both gens NULL -> unchanged
        (1, None, "en", "web", 0),                # cur-only NULL -> added
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id: long, text: string, lang: string, source: string,"
        " n_chars: long",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/documents.parquet"
    )
    out = corpus_snapshot_diff(spark, str(tmp_path))
    got = {
        (r.source, r.status): r.n_docs for r in out.collect()
    }
    assert got == {
        ("web", "removed"): 2,
        ("web", "unchanged"): 2,
        ("web", "changed"): 1,
        ("web", "added"): 2,
    }, got
    # and the DuckDB oracle agrees on the same crafted corpus — the
    # exact comparison the driver harness performs (view registered by
    # hand: the crafted dir carries only the documents table)
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM read_parquet("
        f"'{tmp_path}/documents.parquet/*.parquet')"
    )
    ok, detail = compare(out, ORACLE_SNAPSHOT_DIFF, con)
    assert ok, detail
