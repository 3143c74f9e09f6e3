"""Re-runnable physical-plan audit (backs PLANS.md).

Usage: python scripts/plan_audit.py [sf_dir]
Prints the formatted plan head for each audited operator and FAILs (exit
1) if a required plan property disappears — a regression guard for
pushdown/broadcast/codegen shapes.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from threat_intelligence_knowledge_graph_spark.session import build_session


def plan_of(df) -> str:
    jdf = df._jdf
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return jdf.queryExecution().explainString(mode)


def main(sf_dir: str) -> int:
    spark = build_session("plan-audit", master="local[4]", shuffle_partitions=8)
    import __spark_entry__ as em

    failures = []

    def check(name: str, df, must_contain: list[str], must_not: list[str] = ()):
        plan = plan_of(df)
        for frag in must_contain:
            if frag not in plan:
                failures.append((name, f"missing `{frag}`"))
                print(f"FAIL {name}: missing `{frag}`")
                return
        for frag in must_not:
            if frag in plan:
                failures.append((name, f"unexpected `{frag}`"))
                print(f"FAIL {name}: unexpected `{frag}`")
                return
        print(f"PASS {name}")

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    check(
        "scan_pushdown",
        li.filter(F.col("l_shipdate") <= "1995-01-01").select("l_orderkey"),
        ["PushedFilters: [IsNotNull(l_shipdate)", "l_orderkey:bigint,l_shipdate"],
    )
    check(
        "typing_broadcast_join",
        em.q_kg_ioc_typing(spark, sf_dir),
        ["BroadcastHashJoin Inner BuildRight"],
        must_not=["SortMergeJoin"],
    )
    check(
        "endpoint_semijoin_broadcast",
        em.q_kg_endpoint_semijoin(spark, sf_dir),
        ["BroadcastHashJoin LeftSemi BuildRight"],
        must_not=["SortMergeJoin"],
    )
    check(
        "q1_partial_agg",
        em.q_tpch_q1(spark, sf_dir),
        ["HashAggregate"],
        must_not=["SortAggregate"],
    )
    check(
        "topk_no_global_sort",
        em.q_similarity_topk(spark, sf_dir),
        ["TakeOrderedAndProject"],
    )
    from threat_intelligence_knowledge_graph_spark.operators.chunker import (
        chunk_documents,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("string").alias("conv_id"), F.col("text").alias("doc_text")
    )
    check(
        "chunker_no_udf_no_shuffle",
        chunk_documents(docs, 100, 10).drop("total_chunks"),
        ["posexplode"],
        must_not=["BatchEvalPython", "ArrowEvalPython", "Exchange"],
    )
    spark.stop()
    print(f"\n{'OK' if not failures else 'FAILURES: ' + str(failures)}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"))
