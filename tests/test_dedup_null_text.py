"""Differential pin for the dedup family's NULL-text contract (round-7
review): a NULL-text document must behave identically in Spark and the
DuckDB oracle — no shingles (so it never LSH-pairs, not even with an
EMPTY-text doc), its own NULL bow-fingerprint group, and no chunk rows.
The fixtures carry no NULL text, so this crafts a corpus with the three
hazard shapes (NULL text, empty text, ordinary near-dup pair) and runs
the exact Spark-vs-DuckDB comparison the driver harness performs over
the whole shingle-descended family."""

from __future__ import annotations

import duckdb
import pytest


NEAR_A = "the quick brown fox jumps over the lazy dog again and again"
NEAR_B = "the quick brown fox jumps over the lazy dog again and once"


@pytest.fixture(scope="module")
def crafted(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("nulltext")
    rows = [
        (0, NEAR_A, "en", "web", len(NEAR_A)),
        (1, NEAR_B, "en", "web", len(NEAR_B)),
        (2, None, "en", "web", 0),      # NULL text
        (3, None, "en", "web", 0),      # second NULL text (pairing hazard)
        (4, "", "en", "web", 0),        # EMPTY text (the merge hazard)
        (5, "something else entirely different here", "en", "web", 38),
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id: long, text: string, lang: string, source: string,"
        " n_chars: long",
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
    # embeddings: the semantic side of mm_dedup_keep_list /
    # mm_semantic_dedup links media items 1:1 on id. Axis-orthogonal
    # seed vectors -> no semantic pairs (the NULL contract is about text
    # behavior, not geometry); ids 2,3 (NULL text) HAVE embeddings but
    # no payload, so the media-universe filter must exclude them; ids
    # 6,7 have embeddings but no document row (the link join drops them)
    erows = []
    for s in range(8):
        v = [0.0] * 8
        v[s] = 10.0
        erows.append((s, v, "seed"))
    spark.createDataFrame(
        erows, "vec_id: long, embedding: array<float>, label: string"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/embeddings.parquet")
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM read_parquet("
        f"'{tmp}/documents.parquet/*.parquet')"
    )
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM read_parquet("
        f"'{tmp}/embeddings.parquet/*.parquet')"
    )
    return str(tmp), con


@pytest.mark.parametrize(
    "name",
    [
        "dedup_minhash_lsh",
        "dedup_minhash_estimate",
        "dedup_ngram_jaccard",
        "dedup_shingle_containment",
        "dedup_bow",
        "dedup_chunks",
        "dedup_exact_docs",
        "dedup_simhash",
        "dedup_contamination",
        "dedup_similarity_histogram",
        # the text family shares the same NULL-text contract (round-7
        # review: four text ops broke it — one crashed, three counted a
        # NULL vocab token the oracle's unnest never emits)
        "text_chunk_udtf",
        "text_bigram_lm",
        "text_vocab_growth",
        "text_token_freq",
        "text_token_commonness",
        "text_fingerprint",
        "text_tfidf_topk",
        "text_bpe_merge_pairs",
        "text_stats",
        # span-level family (round-8: the removal op joined the audit)
        "dedup_repeated_ngrams",
        "text_remove_repeated_spans",
        "text_remove_within_repeats",
        "text_benchmark_decontam",
        # sampling/mixing consumers of text (mix_pack_greedy crashed on
        # the NaN a NULL n_tok becomes in the Arrow batch; both packers
        # now share one base projection with the NULL-doc exclusion)
        "mix_pack_greedy",
        "mix_pack_sequences",
        "mix_split_leakage_safe",
        "mix_split_neardup_safe",
        "mix_token_budget",
        "mix_epoch_plan",
        "sample_docs_importance",
        "corpus_build_manifest",
        # multimodal decode family (len(None) crashed the decode kernel;
        # NULL payloads now carry NULL features through nullable dtypes)
        "mm_decode_features",
        "mm_resize",
        "mm_frame_sample",
        "mm_binary_meta",
        "mm_exact_dedup",
        # NULL payload never reaches the phash kernel; short docs are
        # pre-filtered identically in both engines (round-9)
        "mm_phash_neardup",
        # NULL text -> NULL clean_text + NULL counts in both engines
        "text_scrub_pii",
        # NULL text tokenizes to no vocab entries; the merge loop's
        # tie-breaks must agree on the tiny crafted vocabulary
        "text_bpe_vocab",
        # keep-first span removal shares the span family's NULL contract
        "text_dedup_within_keep_first",
        # multimodal keep-list: NULL/short payloads get no row in both
        # engines (the fingerprintable-universe contract; since round 10
        # it also rides the semantic verdict's left join)
        "mm_dedup_keep_list",
        # semantic mm dedup: NULL-payload items leave the media universe
        # even when their embedding exists; embeddings without documents
        # never link
        "mm_semantic_dedup",
        # learned quality gate: NULL-text docs tokenize to no words ->
        # no training rows, no scored rows, in both engines
        "text_quality_classifier",
        # real PPM decode: NULL / sub-96-byte payloads leave the
        # decodable universe identically in both engines
        "mm_decode_ppm",
        # gate-agreement audit: NULL-text docs sit outside the
        # classifier universe, so they appear in no cell
        "text_quality_agreement",
        # winnowing: NULL/short texts produce no grams, hence no
        # fingerprints, in both engines
        "dedup_winnowing",
        # tokenizer application: NULL-text docs tokenize to no words
        "text_tokenize_bpe",
        # the train/apply split variant: NULL held-out docs drop too
        "text_tokenize_bpe_oov",
    ],
)
def test_null_text_family_matches_oracle(spark, crafted, name):
    import __spark_entry__ as e
    from tests.parity import compare

    sf, con = crafted
    ok, detail = compare(e.queries()[name](spark, sf), e.oracle_sql()[name], con)
    assert ok, (name, detail)


def test_null_text_never_pairs(spark, crafted):
    # the specific divergences the review found: NULL-text docs must not
    # pair with each other or with the empty-text doc, and must form
    # their own NULL bow group distinct from the empty-text group
    from datafusion_loki_spark.operators.dedup import dedup_bow, dedup_minhash_lsh

    sf, _con = crafted
    pairs = {
        (r.doc_a, r.doc_b) for r in dedup_minhash_lsh(spark, sf).collect()
    }
    assert pairs == {(0, 1)}, pairs  # only the genuine near-dup pair
    bow = {r.bow_fingerprint: r.n_docs for r in dedup_bow(spark, sf).collect()}
    assert bow[None] == 2  # the two NULL-text docs, their own group
    assert bow.get("d41d8cd98f00b204e9800998ecf8427e") == 1  # empty text alone


def test_remove_repeated_spans_excises_exactly_the_shared_tokens(
    spark, crafted
):
    # NEAR_A and NEAR_B share their first 11 tokens, i.e. span starts
    # 1..6 (start 7 differs: ...again-and-AGAIN vs ...again-and-ONCE),
    # so exactly tokens 1..11 are covered in both docs and each doc
    # keeps only its final token. NULL-text docs emit no row (no token
    # positions); the empty-text doc survives untouched (one ''-token,
    # no spans).
    from datafusion_loki_spark.operators.dedup import (
        text_remove_repeated_spans,
    )

    sf, _con = crafted
    rows = {
        r.doc_id: r for r in text_remove_repeated_spans(spark, sf).collect()
    }
    assert set(rows) == {0, 1, 4, 5}          # NULL-text docs 2,3 absent
    assert rows[0].cleaned_text == "again"
    assert rows[1].cleaned_text == "once"
    assert rows[0].n_removed == rows[1].n_removed == 11
    assert rows[0].n_tokens == rows[1].n_tokens == 12
    assert rows[4].n_removed == 0             # empty text: nothing shared
    assert rows[5].n_removed == 0             # unique doc: untouched
    assert rows[5].cleaned_text == "something else entirely different here"


def test_within_repeats_excises_the_chorus(spark, tmp_path):
    # 13 tokens "a b c d e f X a b c d e f": the 6-gram "a b c d e f"
    # occurs at starts 1 and 8 WITHIN one doc, so positions 1..6 and
    # 8..13 are covered and only token 7 survives. The cross-doc op
    # must NOT touch it (no second document shares the span), pinning
    # the census separation between the two halves of the story.
    from datafusion_loki_spark.operators.dedup import (
        text_remove_repeated_spans,
        text_remove_within_repeats,
    )

    rows = [
        (0, "a b c d e f x a b c d e f", "en", "web", 25),
        (1, "no repetition in this document at all here", "en", "web", 43),
        (2, None, "en", "web", 0),
    ]
    spark.createDataFrame(
        rows,
        "doc_id: long, text: string, lang: string, source: string,"
        " n_chars: long",
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/documents.parquet"
    )
    within = {
        r.doc_id: r
        for r in text_remove_within_repeats(spark, str(tmp_path)).collect()
    }
    assert set(within) == {0, 1}               # NULL-text doc absent
    assert within[0].cleaned_text == "x"
    assert within[0].n_removed == 12 and within[0].n_tokens == 13
    assert within[1].n_removed == 0
    cross = {
        r.doc_id: r
        for r in text_remove_repeated_spans(spark, str(tmp_path)).collect()
    }
    assert cross[0].n_removed == 0             # no cross-doc duplication

    # keep-first differential (round-9 VERDICT #4): the same chorus doc
    # keeps its FIRST "a b c d e f" and loses only the reprise — the
    # legible-refrain semantics the all-occurrence op deliberately
    # doesn't have
    from datafusion_loki_spark.operators.dedup import (
        text_dedup_within_keep_first,
    )

    first = {
        r.doc_id: r
        for r in text_dedup_within_keep_first(spark, str(tmp_path)).collect()
    }
    assert set(first) == {0, 1}                # NULL-text doc absent
    assert first[0].cleaned_text == "a b c d e f x"
    assert first[0].n_removed == 6 and first[0].n_tokens == 13
    assert first[1].n_removed == 0
    # strictly gentler than remove-all on every doc
    assert first[0].n_removed < within[0].n_removed


def test_split_leakage_quarantines_exact_dups_across_buckets(
    spark, tmp_path
):
    # Crafted corpus because the driver-SF data has no straddling exact
    # dups (first SF with one is sf0.1): doc 6 sits in the val bucket
    # (md5('6')[0]='1'), docs 0-3 in train. Val doc 6 shares doc 0's
    # exact text -> quarantined; val doc 27 shares train doc 2's EMPTY
    # text -> quarantined (identical content is identical); val doc 24
    # has NULL text and train doc 1 too -> NULL never matches NULL (each
    # NULL is its own content); val doc 19 is unique -> stays val.
    from datafusion_loki_spark.operators.sampling import (
        mix_split_leakage_safe,
    )

    rows = [
        (0, "shared leaked content here", "en", "web", 26),   # train
        (1, None, "en", "web", 0),                            # train NULL
        (2, "", "en", "web", 0),                              # train empty
        (3, "train only text", "en", "web", 15),              # train
        (6, "shared leaked content here", "en", "web", 26),   # val, leaked
        (19, "unique val content", "en", "web", 18),          # val, clean
        (24, None, "en", "web", 0),                           # val NULL
        (27, "", "en", "web", 0),                             # val, leaked
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id: long, text: string, lang: string, source: string,"
        " n_chars: long",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/documents.parquet"
    )
    got = {
        r.doc_id: (r.init_split, r.leaked, r.final_split)
        for r in mix_split_leakage_safe(spark, str(tmp_path)).collect()
    }
    assert got[0] == ("train", False, "train")
    assert got[6] == ("val", True, "quarantined")
    assert got[27] == ("val", True, "quarantined")
    assert got[19] == ("val", False, "val")
    assert got[24] == ("val", False, "val")   # NULL text never leaks
    assert got[1] == ("train", False, "train")

    # the near-dup level quarantines LSH-paired (not identical) content:
    # doc 33 (val bucket) is NEAR_B to train doc 3's NEAR_A — exact
    # fingerprints differ, so the exact op keeps it, the near-dup op
    # quarantines it; the exact-dup val doc 6 is ALSO near-leaked (an
    # exact dup trivially LSH-pairs)
    from datafusion_loki_spark.operators.sampling import (
        mix_split_neardup_safe,
    )
    from tests.test_dedup_null_text import NEAR_A, NEAR_B

    rows2 = rows + [
        (3000, NEAR_A, "en", "web", len(NEAR_A)),   # train (md5('3000')[0]='4')
        (33, NEAR_B, "en", "web", len(NEAR_B)),     # val bucket
    ]
    df2 = spark.createDataFrame(
        rows2,
        "doc_id: long, text: string, lang: string, source: string,"
        " n_chars: long",
    )
    df2.coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/documents.parquet"
    )
    near = {
        r.doc_id: (r.init_split, r.leaked, r.final_split)
        for r in mix_split_neardup_safe(spark, str(tmp_path)).collect()
    }
    assert near[33] == ("val", True, "quarantined")    # near-dup leak
    assert near[6] == ("val", True, "quarantined")     # exact is also near
    assert near[19] == ("val", False, "val")           # unique val doc
    assert near[3000] == ("train", False, "train")     # train side untouched
    exact_again = {
        r.doc_id: r.leaked
        for r in mix_split_leakage_safe(spark, str(tmp_path)).collect()
    }
    assert exact_again[33] is False   # exact level cannot see near-dups


def test_scrub_pii_cascade_and_nulls(spark, tmp_path):
    # The documents-family PII scrub (round-9): the cascade must consume
    # an email's digits as <EMAIL> (not shred them into <NUM>), a
    # dotted phone as <PHONE> (not half-match the ipv4 rule), count each
    # rule on the ORIGINAL text, and propagate NULL text to NULL
    # clean_text + NULL counts — identically in both engines.
    import duckdb as _duckdb

    from datafusion_loki_spark.operators.text import ORACLES, text_scrub_pii
    from tests.parity import compare

    rows = [
        (0, "contact bob99@example.com or +1 555.123.4567 now", "en",
         "web", 48),
        (1, "server 10.0.0.1 returned code 50042", "en", "web", 36),
        (2, None, "en", "web", 0),
        (3, "no identifiers here at all", "en", "web", 26),
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id: long, text: string, lang: string, source: string,"
        " n_chars: long",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/documents.parquet"
    )
    out = {r.doc_id: r for r in text_scrub_pii(spark, str(tmp_path)).collect()}
    assert out[0].clean_text == "contact <EMAIL> or +1 <PHONE> now"
    assert (out[0].n_email, out[0].n_phone) == (1, 1)
    assert out[1].clean_text == "server <IP> returned code <NUM>"
    # counts on the ORIGINAL text: "10" and "50042" are the \d{2,} runs
    # (the scrubbed text would only have one <NUM> left)
    assert (out[1].n_ipv4, out[1].n_num) == (1, 2)
    assert out[2].clean_text is None and out[2].n_email is None
    assert out[3].clean_text == rows[3][1]

    con = _duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM read_parquet("
        f"'{tmp_path}/documents.parquet/*.parquet')"
    )
    ok, detail = compare(
        text_scrub_pii(spark, str(tmp_path)), ORACLES["text_scrub_pii"], con
    )
    assert ok, detail


def test_bpe_vocab_replays_hand_computed_merges(spark, tmp_path):
    # Hand-derivable BATCHED induction on 'banana banana banana
    # bandana'. Pass 1: (a,n)=8 tops; every other pair shares a or n,
    # so the batch is a singleton. Pass 2: (an,a)=4 TIES (b,an)=4 and
    # wins the s1-lexicographic tie-break ('an' < 'b'); all remaining
    # candidates share an/a -> singleton again; leftmost-first means
    # [b,an,an,a] collapses to [b,an,ana], never [b,ana,na]. Pass 3
    # shows the BATCH: (b,an)=4 selected, (an,ana)/(an,d) share 'an',
    # but (d,ana)=1 is disjoint from {b,an,ban} -> TWO merges in one
    # pass (ranks 3 and 4 — sequential BPE would have ordered (ban,ana)
    # before (d,ana)). Pass 4: (ban,ana)=3; (ban,dana) shares ban.
    # Pass 5: (ban,dana)=1. Pass 6: no pairs left — an empty batch that
    # must CARRY the vocab, identically in both engines.
    import duckdb as _duckdb

    from datafusion_loki_spark.operators.text import ORACLES, text_bpe_vocab
    from tests.parity import compare

    rows = [
        (0, "banana banana banana bandana", "en", "web", 28),
        (1, None, "en", "web", 0),
    ]
    spark.createDataFrame(
        rows,
        "doc_id: long, text: string, lang: string, source: string,"
        " n_chars: long",
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/documents.parquet"
    )
    # 6 merges land across 5 passes + 1 empty carry — past the 4-pass
    # registry prefix (round 13), so pin the depth explicitly
    got = [
        (r.merge_rank, r.s1, r.s2, r.pair_count)
        for r in text_bpe_vocab(spark, str(tmp_path), iters=8)
        .orderBy("merge_rank")
        .collect()
    ]
    assert got == [
        (1, "a", "n", 8),
        (2, "an", "a", 4),     # the tie-break merge
        (3, "b", "an", 4),
        (4, "d", "ana", 1),    # batched with rank 3 (disjoint symbols)
        (5, "ban", "ana", 3),
        (6, "ban", "dana", 1),
    ], got

    con = _duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM read_parquet("
        f"'{tmp_path}/documents.parquet/*.parquet')"
    )
    from datafusion_loki_spark.operators.text import _oracle_bpe_sql

    ok, detail = compare(
        text_bpe_vocab(spark, str(tmp_path), iters=8),
        _oracle_bpe_sql(iters=8),
        con,
    )
    assert ok, detail
    # the registry face (4-pass prefix) also stays oracle-exact here
    ok, detail = compare(
        text_bpe_vocab(spark, str(tmp_path)), ORACLES["text_bpe_vocab"], con
    )
    assert ok, detail


def _naive_bpe(texts, iters, batch, cand):
    """Reference BATCHED BPE trainer, independent of both engines' SQL:
    per pass, vocabulary-weighted pair counts; greedy selection in
    (count desc, s1 asc, s2 asc) order of up to ``batch`` pairwise
    non-interacting merges (no collision among any selected pair's
    {s1, s2, s1+s2}) from the top ``cand`` candidates; then ONE
    leftmost non-overlapping application pass of the whole batch (order-
    independent by the disjointness invariant)."""
    from collections import Counter

    vocab = Counter()
    for t in texts:
        if t is None:
            continue
        for w in " ".join(t.split()).lower().strip().split(" "):
            vocab[tuple(w)] += 1
    merges = []
    for _ in range(iters):
        pairs = Counter()
        for syms, freq in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += freq
        cands = sorted(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )[:cand]
        sel, used = [], set()
        for (s1, s2), cnt in cands:
            trio = {s1, s2, s1 + s2}
            if len(sel) < batch and not (trio & used):
                sel.append((s1, s2, cnt))
                used |= trio
        for s1, s2, cnt in sel:
            merges.append((len(merges) + 1, s1, s2, cnt))
        fuse = {s2: s1 for s1, s2, _ in sel}  # s2 distinct within a batch
        new_vocab = Counter()
        for syms, freq in vocab.items():
            out = []
            for x in syms:
                if x in fuse and out and out[-1] == fuse[x]:
                    out[-1] = out[-1] + x
                else:
                    out.append(x)
            new_vocab[tuple(out)] += freq
        vocab = new_vocab
    return merges


@pytest.mark.parametrize(
    "texts",
    [
        # adjacent-repeat hazard: the merge fold must fuse leftmost
        # non-overlapping ('a n a n a n a' under (a,n))
        ["anananana ananan an", "nananana na na"],
        # tie-heavy tiny vocabulary (every pair count 1 or 2): the
        # (count, s1, s2) tie-break carries the whole ordering
        ["ab ba ab ba cc", "ba ab cc dd", None],
        # merged symbols that CONTAIN earlier merge halves ('th','he',
        # 'the...' chains) plus 1-char words with no pairs
        ["the then there a b c", "then the there the", ""],
        # ZERO mergeable pairs anywhere (all 1-char words / NULL): the
        # engine must return an empty merge table, not crash on the
        # empty reduce (round-9 review regression)
        ["a b c", None, "x y"],
    ],
)
def test_bpe_vocab_matches_naive_reference_trainer(spark, tmp_path, texts):
    import duckdb as _duckdb

    from datafusion_loki_spark.operators.text import (
        BPE_BATCH,
        BPE_CAND,
        BPE_ITERS,
        BPE_PREFIX_ITERS,
        ORACLES,
        text_bpe_vocab,
    )
    from tests.parity import compare

    rows = [
        (i, t, "en", "web", len(t) if t else 0) for i, t in enumerate(texts)
    ]
    out_dir = tmp_path  # unique per parametrized case already
    spark.createDataFrame(
        rows,
        "doc_id: long, text: string, lang: string, source: string,"
        " n_chars: long",
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{out_dir}/documents.parquet"
    )
    got = [
        (r.merge_rank, r.s1, r.s2, r.pair_count)
        for r in text_bpe_vocab(spark, str(out_dir))
        .orderBy("merge_rank")
        .collect()
    ]
    # the registry face runs the 4-pass prefix (round 13); the naive
    # reference must agree at that depth AND at the full budget
    assert got == _naive_bpe(
        texts, BPE_PREFIX_ITERS, BPE_BATCH, BPE_CAND
    ), texts
    got_full = [
        (r.merge_rank, r.s1, r.s2, r.pair_count)
        for r in text_bpe_vocab(spark, str(out_dir), iters=BPE_ITERS)
        .orderBy("merge_rank")
        .collect()
    ]
    assert got_full == _naive_bpe(texts, BPE_ITERS, BPE_BATCH, BPE_CAND)
    con = _duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM read_parquet("
        f"'{out_dir}/documents.parquet/*.parquet')"
    )
    ok, detail = compare(
        text_bpe_vocab(spark, str(out_dir)), ORACLES["text_bpe_vocab"], con
    )
    assert ok, detail


def test_tokenize_bpe_applies_the_learned_merges(spark, tmp_path):
    # The applied tokenizer's counts must be self-consistent: doc 1's
    # extra 'ba'/'nan' vocabulary changes the merge sequence vs the
    # banana-only corpus, so the test asserts the structural bounds
    # (every word compresses to between 1 symbol and its char length)
    # and full value parity with the oracle; the NULL-text doc drops.
    import duckdb as _duckdb

    from datafusion_loki_spark.operators.text import (
        ORACLES,
        text_tokenize_bpe,
    )
    from tests.parity import compare

    rows = [
        (0, "banana banana banana bandana", "en", "web", 28),
        (1, "ba nan", "en", "web", 6),  # partial merges only
        (2, None, "en", "web", 0),
    ]
    spark.createDataFrame(
        rows,
        "doc_id: long, text: string, lang: string, source: string,"
        " n_chars: long",
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/documents.parquet"
    )
    out = {
        r.doc_id: (r.n_ws_tokens, r.n_bpe_tokens)
        for r in text_tokenize_bpe(spark, str(tmp_path)).collect()
    }
    assert 2 not in out
    assert out[0][0] == 4  # four whitespace words
    # with 'ba'/'nan' in the vocabulary the merge sequence differs from
    # the banana-only corpus, but every word still compresses below its
    # character length and at or above 1 symbol
    assert out[0][0] <= out[0][1] <= len("banana") * 3 + len("bandana")
    assert out[1][0] == 2
    con = _duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM read_parquet("
        f"'{tmp_path}/documents.parquet/*.parquet')"
    )
    ok, detail = compare(
        text_tokenize_bpe(spark, str(tmp_path)),
        ORACLES["text_tokenize_bpe"],
        con,
    )
    assert ok, detail


def test_tokenize_bpe_oov_replays_merges_on_unseen_words(spark, tmp_path):
    # Train on 'banana banana banana bandana' (doc 0, train bucket);
    # held-out doc 27 (md5 bucket '0') mixes SEEN words with true OOV.
    # Learned merges (hand-derived in the sibling test): an, ana,
    # {ban, dana} batched in pass 3, banana, bandana. OOV replay:
    # 'banal' = chars b a n a l -> (a,n): [b,an,a,l] -> (an,a):
    # [b,ana,l] -> pass 3 {(b,an),(d,ana)}: next after b is 'ana' not
    # 'an', no d -> carry -> 3 symbols; 'dana' = d a n a -> [d,an,a] ->
    # [d,ana] -> pass 3 (d,ana) FUSES -> [dana] = 1 symbol (sequential
    # BPE would have left it at 2 — the batch admitted (d,ana));
    # seen 'banana' = 1 symbol.
    import duckdb as _duckdb

    from datafusion_loki_spark.operators.text import (
        ORACLES,
        text_tokenize_bpe_oov,
    )
    from tests.parity import compare

    rows = [
        (0, "banana banana banana bandana", "en", "web", 28),  # train
        (27, "banana banal dana", "en", "web", 17),            # held out
        (59, None, "en", "web", 0),                            # held out NULL
    ]
    spark.createDataFrame(
        rows,
        "doc_id: long, text: string, lang: string, source: string,"
        " n_chars: long",
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/documents.parquet"
    )
    out = {
        r.doc_id: (r.n_ws_tokens, r.n_bpe_tokens, r.n_oov_words)
        for r in text_tokenize_bpe_oov(spark, str(tmp_path)).collect()
    }
    assert set(out) == {27}  # train doc and NULL-text doc emit no row
    n_ws, n_bpe, n_oov = out[27]
    assert n_ws == 3
    assert n_oov == 2          # 'banal' and 'dana' are unseen
    assert n_bpe == 1 + 3 + 1  # banana(seen,1) + banal(3) + dana(1)

    con = _duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM read_parquet("
        f"'{tmp_path}/documents.parquet/*.parquet')"
    )
    ok, detail = compare(
        text_tokenize_bpe_oov(spark, str(tmp_path)),
        ORACLES["text_tokenize_bpe_oov"],
        con,
    )
    assert ok, detail
