"""Head-entity skew rehearsal (north rule: salted repartitioning for
high-frequency QIDs), measured at 20M triples.

Three workloads on a deterministic Zipf-head triples table (one subject
owns 30% of all rows, with 10^6 distinct neighbor objects so the ranking
window really does pile onto one task):

1. count per subject, plain vs salt — expected ~parity: map-side combine
   already collapses the hot key inside each task (the docstring claim in
   kgquery.triples_per_subject, now with a number behind it).
2. exact top-k objects per subject, plain window vs salted two-stage cut
   (kgquery.top_objects_per_subject) — the case where one task otherwise
   serializes on the head entity's whole neighbor set.
3. triples joined to a 1M-row per-subject dim on subj with broadcast OFF
   (forcing the shuffle join a 100 TB fact side would face), AQE skew
   split ON vs OFF.

Each cell is min-of-3 steady-state wall in ONE session (JVM + codegen
warm); results appended by hand to BENCH.md §skew.

Usage: python tools/bench_skew.py [n_rows]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from entity_extraction_svc_spark.operators.kgquery import (
    top_objects_per_subject,
    triples_per_subject,
)
from entity_extraction_svc_spark.session import get_spark


def skewed(spark, n):
    # 30% of rows -> Qhot with ~n/4 distinct objs (the window-skew knob:
    # the ranking input per subject is its DISTINCT neighbor count, so it
    # must grow with n for the rehearsal to stress what 10^12 triples
    # would); the rest uniform over 2M cold subjects x small neighbor sets
    hot_objs = max(n // 4, 1_000)
    return spark.range(n).select(
        F.when(F.col("id") % 10 < 3, F.lit("Qhot"))
        .otherwise(
            F.concat(F.lit("Q"), F.pmod(F.xxhash64("id"), F.lit(2_000_000)).cast("string"))
        )
        .alias("subj"),
        F.lit("P31").alias("pred"),
        F.when(
            F.col("id") % 10 < 3,
            F.concat(F.lit("O"), F.pmod(F.xxhash64("id", F.lit(1)), F.lit(hot_objs)).cast("string")),
        )
        .otherwise(F.concat(F.lit("o"), (F.col("id") % 13).cast("string")))
        .alias("obj"),
    )


def timeit(label, fn, reps=3):
    walls = []
    for _ in range(reps):
        t0 = time.time()
        fn()
        walls.append(time.time() - t0)
    print(f"{label}: {min(walls):.2f}s (min of {reps}: {[round(w, 2) for w in walls]})",
          flush=True)
    return min(walls)


def main(n=20_000_000):
    spark = get_spark(app_name="skew_bench", master="local[32]",
                      shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    t = skewed(spark, n).persist()
    print(f"rows={t.count():,}", flush=True)

    r = {}
    r["count_plain"] = timeit("count per subj, plain",
                              lambda: triples_per_subject(t).count())
    r["count_salted"] = timeit("count per subj, salt=64",
                               lambda: triples_per_subject(t, salt=64).count())

    r["topk_window"] = timeit("top-10 objs/subj, plain window",
                              lambda: top_objects_per_subject(t, k=10).count())
    r["topk_salted"] = timeit("top-10 objs/subj, salt=64 two-stage",
                              lambda: top_objects_per_subject(t, k=10, salt=64).count())

    # 4. PMI top-k neighborhoods with a celebrity entity (VERDICT r4 #3):
    # every doc links Qceleb + two quasi-unique partners, so Qceleb's
    # symmetric neighbor list is ~n/2 rows and the plain ranking window
    # sends ALL of it to one task; the salted two-stage cut pre-cuts per
    # (entity, hash(partner) % 64).
    from entity_extraction_svc_spark.operators.cooccur import (
        pmi_relatedness,
    )

    m = n // 4
    linked = spark.range(m).select(
        F.concat(F.lit("u"), F.col("id")).alias("url"),
        F.explode(
            F.array(
                F.lit("Qceleb"),
                F.concat(F.lit("P"), F.pmod(F.xxhash64("id"),
                                            F.lit(2_000_000)).cast("string")),
                F.concat(F.lit("R"), F.pmod(F.xxhash64("id", F.lit(1)),
                                            F.lit(1_000_000)).cast("string")),
            )
        ).alias("qid"),
    ).persist()
    print(f"linked rows={linked.count():,}", flush=True)
    r["pmi_topk_window"] = timeit(
        "pmi top-10 neighborhoods, plain window",
        lambda: pmi_relatedness(linked, top_k=10).count())
    r["pmi_topk_salted"] = timeit(
        "pmi top-10 neighborhoods, salt=64 two-stage",
        lambda: pmi_relatedness(linked, top_k=10, salt=64).count())
    linked.unpersist()

    dim = (
        t.groupBy("subj").agg(F.count("*").alias("deg"))
    ).persist()
    dim.count()

    def join_run(skew_on: bool):
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(skew_on).lower())
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            return t.join(dim, "subj").filter(F.col("deg") > 1).count()
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
            spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")

    r["join_skew_off"] = timeit("fact join dim on subj, AQE skewJoin OFF",
                                lambda: join_run(False))
    r["join_skew_on"] = timeit("fact join dim on subj, AQE skewJoin ON",
                               lambda: join_run(True))

    import json
    print(json.dumps({"n_rows": n, **{k: round(v, 2) for k, v in r.items()}}))
    spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000)
