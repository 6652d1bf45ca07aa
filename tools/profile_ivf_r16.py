"""Per-verb wall-clock profile of the IVF lifecycle faces (round 16,
guide §1: measure first). Times each lifecycle verb of
sim_ivf_index_retrain / _snapshot separately, twice (min reported), in
one session at $SPARK_GRAFT_SF_DIR.

Usage: python tools/profile_ivf_r16.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from datafusion_loki_spark.session import get_spark
    from datafusion_loki_spark.operators import similarity as sim
    from pyspark.sql import functions as F

    spark = get_spark(app_name="profile_ivf_r16")

    def t(label, fn, n=2):
        best = float("inf")
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        print(f"{label:28s} {best:7.3f}s")
        return best

    emb = sim.load_table(spark, sf_dir, "embeddings")
    emb_d = emb.select(
        "vec_id", F.expr(sim._TO_DOUBLE.format(a="embedding")).alias("e")
    )
    # warm
    idx = sim.scratch_index_dir(spark, sf_dir, "prof_warm")
    sim.build_ivf_index(spark, sf_dir, idx)
    sim.query_ivf_index(spark, sf_dir, idx).count()

    idx = sim.scratch_index_dir(spark, sf_dir, "prof")
    spark.sparkContext.setJobDescription("verb: build")
    t("build_ivf_index", lambda: sim.build_ivf_index(spark, sf_dir, idx))
    spark.sparkContext.setJobDescription("verb: append")
    t(
        "append_ivf_index",
        lambda: sim.append_ivf_index(
            spark, idx, sim._ivf_decorrelated_batch(emb_d)
        ),
        n=1,
    )
    spark.sparkContext.setJobDescription("verb: delete")
    t(
        "delete_ivf_index",
        lambda: sim.delete_ivf_index(spark, idx, sim._ivf_delete_ids(emb)),
        n=1,
    )
    spark.sparkContext.setJobDescription("verb: retrain")
    t("retrain_ivf_index", lambda: sim.retrain_ivf_index(spark, idx), n=1)
    spark.sparkContext.setJobDescription("verb: query")
    t("query_ivf_index+count", lambda: sim.query_ivf_index(spark, sf_dir, idx).count())
    spark.sparkContext.setJobDescription(None)

    # fit in isolation (both gate paths)
    train = emb_d.where(F.expr(sim._TRAIN_PRED_SPARK))
    def fit_local():
        a, c = sim._kmeans_fit(emb_d, train)
        c.count()
        a.write.format("noop").mode("overwrite").save()
    t("kmeans_fit local+assign", fit_local)

    spark.conf.set(sim._KMEANS_LOCAL_FIT_CONF, "0")
    def fit_dist():
        a, c = sim._kmeans_fit(emb_d, train)
        c.count()
        a.write.format("noop").mode("overwrite").save()
    t("kmeans_fit dist +assign", fit_dist)
    spark.conf.unset(sim._KMEANS_LOCAL_FIT_CONF)

    spark.stop()


if __name__ == "__main__":
    main()
