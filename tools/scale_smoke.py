"""Scaling smoke: measure how the headline operators scale with data size.

Builds k-fold replicas of the sf0.1 fixtures (keys remapped, text/vector
content decorrelated per replica so the WORKLOAD SHAPE is preserved —
replicated text would manufacture k² near-dup structure that the real
corpus doesn't have), then times a representative query set at each k and
prints per-query wall times + the k→2k growth ratios. Near-linear ratios
(≈2 for scan/agg-bound, a bit under for fixed-overhead-dominated) are the
pass condition; super-linear growth flags a plan that would not survive
the 100 TB scale-up.

Usage: python tools/scale_smoke.py [k ...]   # default 1 2 4
Writes replicas under /tmp/spark_graft_scale/x{k}/ (reused if present).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE_SF = "/root/testdata/sf0.1"
OUT_ROOT = "/tmp/spark_graft_scale"
KEY_OFFSET = 10_000_000

# tables replicated with remapped keys; the rest are dimensions, copied 1:1
COPY_TABLES = ["region", "nation", "customer", "supplier", "part"]

SMOKE_QUERIES = [
    # scan/agg-bound
    "text_stats",
    "q1_pricing_summary",
    "log_agg_by_label",
    # shuffle joins
    "q3_shipping_priority",
    "log_asof_join",
    # dedup pipeline (banding + CC rounds — the least predictable family)
    "dedup_exact_docs",
    "dedup_minhash_lsh",
    "dedup_cc_groups",
    # ANN (broadcast-query scoring + trained index)
    "sim_topk_cosine",
    "sim_ivf_kmeans_topk",
    # text corpus joins — all three are the tf-compressed window shapes
    # (round 7); tfidf's x64 blow-up is what this harness exists to catch
    "text_tfidf_topk",
    "text_token_commonness",
    "text_bigram_lm",
    # binary chunk near-dup — the engine's largest fixed cost
    "mm_chunk_dedup",
    # span-level dedup (token-scale explode through two shuffles; the
    # census partial-agg is what keeps boilerplate hot spans linear)
    "dedup_repeated_ngrams",
    # round 8: the span-removal op (occurrence explode + covered-
    # position distinct + per-doc rebuild — the family's largest
    # token-volume shape) and the decontamination join; the split op
    # pins the one-shuffle window shape
    "text_remove_repeated_spans",
    "text_benchmark_decontam",
    "mix_split_leakage_safe",
    "mix_split_neardup_safe",
    "emb_matryoshka_recall",
    # persisted-index semantic dedup (index build + within-cell pair
    # join — pair space must stay O(sum cell^2), growing ~linearly when
    # replica content is decorrelated)
    "dedup_semantic_cluster",
    # round 9: the perceptual-hash banded join (replica suffixing keeps
    # payload bytes distinct across replicas, so candidate pairs scale
    # with the planted variants — linearly), the scan-speed PII cascade,
    # the keep-first span removal, and the N-iteration BPE loop (vocab
    # grows ~linearly with decorrelated replicas — the loop must stay
    # vocab-bound, never corpus-bound)
    "mm_phash_neardup",
    "text_scrub_pii",
    "text_dedup_within_keep_first",
    "text_bpe_vocab",
    # round 10: the learned quality gate (one shard-scale training pass
    # + one corpus scoring pass — both must stay linear; the vocab-stats
    # join is merge-pinned) and the embedding-space mm dedup (persisted
    # index + cell-bounded pair join + two media-link joins)
    "text_quality_classifier",
    "mm_semantic_dedup",
    # round 10: the engine's largest explode (char-gram rows through one
    # doc-window) — gram volume is linear in corpus bytes, the pair join
    # is bucket-capped; the rung must stay ~linear
    "dedup_winnowing",
    # round 12: the snapshot-protocol lifecycle (two fits + two corpus
    # writes — both must stay linear; manifest/resolution overhead is
    # O(1) per verb), and the three new decode kernels (per-item Python
    # work: packed-bit palette, 7-pass Adam7, Huffman+IDCT JPEG — cost
    # is linear in ITEM COUNT, the rung catches any per-batch blowup)
    "sim_ivf_snapshot_reads",
    "mm_decode_png_palette",
    "mm_decode_png_adam7",
    "mm_decode_jpeg",
    # round 13: the animated-GIF kernel (3 LZW streams + compositing per
    # item — linear in item count), the decode-gated funnel (keep-list
    # DAG + validate kernel + 1-row rollup), and the full-budget BPE
    # apply (training to exhaustion + artifact stage + corpus join —
    # must stay vocab-bound like the vocab rung)
    "mm_decode_gif_frames",
    "mm_pipeline_funnel",
    "text_tokenize_bpe",
    # round 13 (late): the TIFF kernel (per-item IFD walk + 3-strip
    # PackBits) — the decode family's newest per-item shape
    "mm_decode_tiff",
]


def build_replica(spark, k: int) -> str:
    from pyspark.sql import functions as F

    out = f"{OUT_ROOT}/x{k}"
    if os.path.exists(f"{out}/_DONE"):
        return out
    os.makedirs(out, exist_ok=True)

    def write(df, name):
        df.coalesce(max(1, k)).write.mode("overwrite").parquet(
            f"{out}/{name}.parquet"
        )

    for t in COPY_TABLES:
        write(spark.read.parquet(f"{BASE_SF}/{t}.parquet"), t)

    docs = spark.read.parquet(f"{BASE_SF}/documents.parquet")
    emb = spark.read.parquet(f"{BASE_SF}/embeddings.parquet")
    ev = spark.read.parquet(f"{BASE_SF}/events.parquet")
    li = spark.read.parquet(f"{BASE_SF}/lineitem.parquet")
    od = spark.read.parquet(f"{BASE_SF}/orders.parquet")

    d_parts, e_parts, v_parts, l_parts, o_parts = [], [], [], [], []
    for i in range(k):
        off = i * KEY_OFFSET
        # suffix EVERY token with the replica id: intra-replica shingle /
        # duplicate structure is identical to the base corpus, while NO
        # shingle crosses replicas — dedup workload scales linearly like
        # a real corpus, instead of k-squared manufactured near-dups
        d_parts.append(
            docs.select(
                (F.col("doc_id") + off).alias("doc_id"),
                (
                    F.col("text")
                    if i == 0
                    else F.expr(f"regexp_replace(text, '(\\\\S+)', '$1r{i}')")
                ).alias("text"),
                "lang",
                "source",
                "n_chars",
            )
        )
        # rotate each replica's vectors by shifting one coordinate — the
        # cosine topology within a replica is preserved, across replicas
        # vectors stay distinct; query vectors (vec_id < 5) exist only in
        # replica 0, matching the bounded-query-set contract
        e_parts.append(
            emb.select(
                (F.col("vec_id") + off).alias("vec_id"),
                (
                    F.col("embedding")
                    if i == 0
                    else F.expr(
                        f"transform(embedding, (x, j) -> CASE WHEN j = 0"
                        f" THEN cast(x + {0.37 * i} as float) ELSE x END)"
                    )
                ).alias("embedding"),
                "label",
            )
        )
        v_parts.append(
            ev.select(
                (F.col("event_id") + off).alias("event_id"),
                "ts",
                (F.col("user_id") + off).alias("user_id"),
                "event_type",
                "value",
                "props",
            )
        )
        l_parts.append(
            li.withColumn("l_orderkey", F.col("l_orderkey") + off)
        )
        o_parts.append(
            od.withColumn("o_orderkey", F.col("o_orderkey") + off)
        )

    def union_all(parts):
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        return df

    write(union_all(d_parts), "documents")
    write(union_all(e_parts), "embeddings")
    write(union_all(v_parts), "events")
    write(union_all(l_parts), "lineitem")
    write(union_all(o_parts), "orders")
    open(f"{out}/_DONE", "w").write("ok")
    return out


def main() -> None:
    ks = [int(a) for a in sys.argv[1:]] or [1, 2, 4]
    # SPARK_GRAFT_SMOKE_ONLY=a,b,c restricts the ladder to named queries
    # (targeted rungs — e.g. the BPE per-merge-cost criterion — without
    # paying the full 26-query suite per k)
    from datafusion_loki_spark.session import get_spark

    import __spark_entry__ as entrymod

    only = os.environ.get("SPARK_GRAFT_SMOKE_ONLY")
    global SMOKE_QUERIES
    if only:
        # any registered query is allowed, not just ladder members —
        # validated BEFORE the expensive replica build, where a typo
        # costs nothing instead of minutes (round-10 review)
        SMOKE_QUERIES = [q.strip() for q in only.split(",") if q.strip()]
        unknown = [q for q in SMOKE_QUERIES if q not in entrymod.queries()]
        if unknown:
            raise SystemExit(
                f"SPARK_GRAFT_SMOKE_ONLY names not registered: {unknown}"
            )

    # Build ALL replicas in one session, then stop it and time in a FRESH
    # one: the union+write build job leaves enough GC/codegen pressure to
    # distort the first measurements that follow it (observed: a 5.5x
    # phantom "super-linear" ratio that disappeared in a clean session —
    # the same ambient-variance trap PERF_NOTES.md documents).
    spark = get_spark(app_name="scale_smoke_build")
    dirs = {k: build_replica(spark, k) for k in ks}
    spark.stop()

    spark = get_spark(app_name="scale_smoke")
    queries = entrymod.queries()
    results: dict[int, dict[str, float]] = {}
    for k in ks:
        sf_dir = dirs[k]
        timings = {}
        for name in SMOKE_QUERIES:
            queries[name](spark, sf_dir).count()  # warm plan/codegen
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                queries[name](spark, sf_dir).count()
                best = min(best, time.perf_counter() - t0)
            timings[name] = round(best, 3)
            print(f"x{k} {name} {timings[name]}", flush=True)
        results[k] = timings

    print(json.dumps({f"x{k}": v for k, v in results.items()}))
    if len(ks) >= 2:
        print(f"\n{'query':28s} " + " ".join(f"x{k:<6}" for k in ks) + " ratios")
        for name in SMOKE_QUERIES:
            times = [results[k][name] for k in ks]
            ratios = [
                round(b / a, 2) if a > 0 else float("nan")
                for a, b in zip(times, times[1:])
            ]
            print(
                f"{name:28s} "
                + " ".join(f"{t:<7.3f}" for t in times)
                + " "
                + str(ratios)
            )
    spark.stop()


if __name__ == "__main__":
    main()
