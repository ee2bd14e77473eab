"""Round-13 evidence capture: PRE-checkpoint physical plans.

The benched entries for the rewritten text-stats and pair-generation
operators return eager localCheckpoints, so their entry-level
``explain("formatted")`` shows only ``Scan ExistingRDD`` (VERDICT r12
"What's wrong" #6). This dumps the *scoring/pair pipeline* plans the
checkpoint hides — the same shapes the plan-pin tests in
``tests/test_plans.py`` assert on — to
``plans/r13/<name>_precheckpoint_<tag>.txt``.

Usage: python tools/plan_precheckpoint_r13.py [--tag after] [--sf SF_DIR]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag = "after"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    args = iter(sys.argv[1:])
    for a in args:
        if a == "--tag":
            tag = next(args)
        elif a == "--sf":
            sf_dir = next(args)

    from pyspark.sql import functions as F

    from mindb_spark.session import get_spark

    spark = get_spark("plan-precheckpoint-r13", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    plan_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r13",
    )
    os.makedirs(plan_dir, exist_ok=True)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    def dump(name: str, df) -> None:
        p = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(plan_dir, f"{name}_precheckpoint_{tag}.txt")
        with open(path, "w") as f:
            f.write(p)
        n_ex = p.count("Exchange")
        n_gen = p.count("Generate")
        print(f"{name}: exchanges={n_ex} generates={n_gen} -> {path}")

    # text stats (round 13 rewrite): the LAZY single-pipeline plans
    from mindb_spark.operators.corpus import tfidf_top_terms, unigram_logprob

    dump("text_logprob", unigram_logprob(docs, materialize=False))
    dump("tfidf_top_terms", tfidf_top_terms(docs, materialize=False))

    # pair generation (round 13 staged Generates): the candidate pipeline
    # the dedup/similarity lanes all share, pre-checkpoint
    from mindb_spark.functions.text import exploded_shingle_hashes
    from mindb_spark.operators.dedup import _cooccur_pair_rows

    lists = (
        exploded_shingle_hashes(
            docs.select("doc_id", "text"), "doc_id", "text", 3
        )
        .groupBy("shingle")
        .agg(F.sort_array(F.collect_list("_id")).alias("_ids"))
        .where(F.size("_ids") > 1)
    )
    dump("cooccur_pairs", _cooccur_pair_rows(lists))

    spark.stop()


if __name__ == "__main__":
    main()
