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


def _ktruss_round_plan(em, spark, sf_dir):
    """One k_truss peel round's un-checkpointed support plan over the
    planted truss gadgets (the q_graph_ktruss input)."""
    from threat_intelligence_knowledge_graph_spark.operators.graph_algos import (
        _canonical_edges,
        edge_support,
    )

    return edge_support(
        _canonical_edges(em._truss_gadget_edges(spark, sf_dir), "src", "dst")
    )


def _anf_round_plan(spark):
    """One HyperANF round's un-checkpointed sketch-merge plan over a
    tiny in-memory graph (topology is irrelevant to the plan shape)."""
    from pyspark.sql import functions as F
    from threat_intelligence_knowledge_graph_spark.operators.graph_algos import (
        _anf_round,
    )

    sym = spark.createDataFrame([("a", "b"), ("b", "a")], ["u", "v"])
    sk = spark.createDataFrame([("a",), ("b",)], ["id"]).select(
        "id", F.array(*[F.lit(0) for _ in range(16)]).alias("regs")
    )
    return _anf_round(sym, sk, 16)


def _mst_phase_plan(em, spark, sf_dir):
    """One Borůvka phase's un-checkpointed selection plan over the
    planted chord-triangle graph (the q_graph_mst input)."""
    from pyspark.sql import functions as F
    from threat_intelligence_knowledge_graph_spark.operators.mst import (
        _canonical_edges,
        _phase_select,
    )

    from pyspark.sql import Window

    o = em._t(spark, sf_dir, "orders").select("o_orderkey")
    idx = o.select(
        (F.row_number().over(Window.orderBy("o_orderkey")) - 1).alias("i")
    ).filter(F.col("i") < 256)
    a, b = idx.alias("a"), idx.alias("b")
    ai = F.col("a.i")
    edges = a.join(b, F.col("b.i") == ai + 1).select(
        ai.alias("src"),
        F.col("b.i").alias("dst"),
        (F.lit(100) * (ai % 2) + ai + 10).cast("double").alias("weight"),
    )
    e = _canonical_edges(edges, "src", "dst", "weight")
    comp = (
        e.select(F.col("a").alias("id"))
        .union(e.select(F.col("b").alias("id")))
        .distinct()
        .withColumn("comp", F.col("id"))
    )
    _, sel = _phase_select(e, comp)
    return sel


def main(sf_dir: str) -> int:
    spark = build_session("plan-audit", master="local[4]", shuffle_partitions=8)
    import __spark_entry__ as em

    failures = []

    def check(
        name: str,
        df,
        must_contain: list[str],
        must_not: list[str] = (),
        max_counts: dict[str, int] | None = None,
    ):
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
        for frag, cap in (max_counts or {}).items():
            n = plan.count(frag)
            if n > cap:
                failures.append((name, f"`{frag}` × {n} > {cap}"))
                print(f"FAIL {name}: `{frag}` × {n} > {cap}")
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

    # round 2 shapes -------------------------------------------------------
    from threat_intelligence_knowledge_graph_spark.operators.minhash import (
        lsh_band_keys,
        word_shingles,
    )

    raw_docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    band_plan = plan_of(lsh_band_keys(word_shingles(raw_docs, "doc_id", "text")))
    # one distinct (partial+final) + ONE wide min-agg (partial+final); the
    # old seed-join + collect_list path added a third aggregation pair.
    n_aggs = band_plan.count("HashAggregate") + band_plan.count("ObjectHashAggregate")
    if n_aggs <= 4 and "Generate" in band_plan:
        print("PASS minhash_band_keys_single_agg")
    else:
        failures.append(("minhash_band_keys_single_agg", f"aggs={n_aggs}"))
        print(f"FAIL minhash_band_keys_single_agg: aggregate pairs={n_aggs}")

    from threat_intelligence_knowledge_graph_spark.operators.extraction import (
        extract_graph_records_fused,
    )

    from threat_intelligence_knowledge_graph_spark.schemas import TRANSCRIPTS_SCHEMA

    tr = spark.createDataFrame(
        [("c1", 0, "a", "The domain evil.example.net resolves to 10.0.0.1.", None, None)],
        schema=TRANSCRIPTS_SCHEMA,
    )
    import re as _re

    fused_plan = plan_of(extract_graph_records_fused(tr, num_partitions=4, emit="edges"))
    # formatted mode prints each node in the tree AND a details header
    # "(n) Exchange" — count only the details headers.
    n_exchanges = len(_re.findall(r"^\(\d+\) Exchange", fused_plan, _re.MULTILINE))
    if n_exchanges == 1:
        print("PASS fused_single_exchange")
    else:
        failures.append(("fused_single_exchange", n_exchanges))
        print(f"FAIL fused_single_exchange: exchanges={n_exchanges}")

    # single-scan banded near-dup: after execution AQE must reuse the
    # signature exchange for the self-join (one signature computation).
    from threat_intelligence_knowledge_graph_spark.operators.similarity import (
        embedding_near_duplicates,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    nd = embedding_near_duplicates(emb, threshold=0.99, dim=int(emb.select(F.size("embedding")).first()[0]))
    nd.collect()
    executed = nd._jdf.queryExecution().executedPlan().toString()
    if "ReusedExchange" in executed:
        print("PASS neardup_reused_exchange")
    else:
        failures.append(("neardup_reused_exchange", "no ReusedExchange"))
        print("FAIL neardup_reused_exchange: signature self-join not reused")

    # round 3 shapes -------------------------------------------------------
    # Decontamination: the eval-gram side must broadcast (the corpus gram
    # stream is never shuffled on the gram key).
    check(
        "decontaminate_broadcast_eval",
        em.q_ngram_decontaminate(spark, sf_dir),
        ["BroadcastHashJoin"],
        must_not=["SortMergeJoin"],
    )
    # Stratified sampling: a pure scan+filter — no exchange, no Python.
    check(
        "stratified_sample_no_shuffle",
        em.q_sample_stratified(spark, sf_dir),
        ["Filter"],
        must_not=["Exchange", "BatchEvalPython", "ArrowEvalPython"],
    )
    check(
        # Equi-joins only (keyed shuffles); an unkeyed pair blowup would
        # surface as CartesianProduct/BroadcastNestedLoopJoin. Python
        # must never appear — these are pure Catalyst ops.
        "graph_algos_no_cartesian",
        em.q_graph_triangle_count(spark, sf_dir),
        ["Join"],
        must_not=["CartesianProduct", "BroadcastNestedLoopJoin", "EvalPython"],
    )
    check(
        "node_similarity_no_cartesian",
        em.q_graph_node_similarity(spark, sf_dir),
        ["Join"],
        must_not=["CartesianProduct", "BroadcastNestedLoopJoin", "EvalPython"],
    )
    check(
        # HyperANF: audit ONE round's UN-checkpointed plan (the
        # _ktruss_round_plan precedent — the operator's checkpointed
        # output plan shows only the final projection, which would make
        # this guard vacuous). The round must be a keyed equi-join
        # (SortMerge or BroadcastHash) + HashAggregate over the packed
        # register arrays — no cartesian, no Python.
        "anf_round_no_cartesian_no_python",
        _anf_round_plan(spark),
        ["Join", "HashAggregate"],
        must_not=["CartesianProduct", "BroadcastNestedLoopJoin", "EvalPython"],
    )
    check(
        # link prediction: through-node self-join + degree joins + the
        # adjacency anti-join — ALL keyed equi-joins, no cartesian, no
        # Python anywhere in the plan.
        "link_prediction_no_cartesian",
        em.q_graph_link_prediction(spark, sf_dir),
        ["Join"],
        must_not=["CartesianProduct", "BroadcastNestedLoopJoin", "EvalPython"],
    )
    check(
        # k-truss: the per-round wedge self-join is keyed on the shared
        # neighbor and closed by an edge equi-join — never cartesian;
        # the x.id < y.id predicate must ride the keyed join, not force
        # a nested loop.
        # (audited via edge_support — the returned frame is a
        # localCheckpoint scan, so the per-round plan is inspected
        # directly.)
        "ktruss_round_no_cartesian",
        _ktruss_round_plan(em, spark, sf_dir),
        ["Join"],
        must_not=["CartesianProduct", "BroadcastNestedLoopJoin", "EvalPython"],
    )
    check(
        # Borůvka phase: endpoint→component labels are two keyed
        # equi-joins, min-edge selection is a hash aggregate with a
        # map-side partial (partial_min in the plan) — never a
        # cartesian pair blowup, never Python.
        "mst_phase_no_cartesian",
        _mst_phase_plan(em, spark, sf_dir),
        ["Join", "partial_min"],
        must_not=["CartesianProduct", "BroadcastNestedLoopJoin", "EvalPython"],
    )
    check(
        # PII scrub is one projection over the scan: no shuffle, no
        # Python, and column pruning reaches the reader.
        "scrub_pii_single_projection",
        em.q_text_scrub_pii(spark, sf_dir),
        ["Project"],
        must_not=["Exchange", "EvalPython"],
    )
    # round 5 shapes -------------------------------------------------------
    # rcATT store normalization must use the Catalyst py_title/node_id
    # twins, never a per-row Python UDF (the r4 verdict nit).
    from threat_intelligence_knowledge_graph_spark.operators.rcatt import (
        attack_nodes,
        technique_tactic_edges,
    )

    det = spark.createDataFrame(
        [("c1", "T1059", 0.9)], ["conv_id", "code", "confidence"]
    )
    check(
        "rcatt_nodes_no_python_udf",
        attack_nodes(det, "ATT&CK_Technique"),
        ["Project"],
        must_not=["EvalPython", "pythonUDF"],
    )
    check(
        "rcatt_edges_no_python_udf",
        technique_tactic_edges(det, det.select("conv_id", F.lit("TA0002").alias("code"))),
        ["Join"],
        must_not=["EvalPython", "pythonUDF"],
    )
    check(
        # co-occurrence construction: keyed self-equi-join on the
        # context tuple, never an unkeyed pair blowup or Python.
        "cooccurrence_no_cartesian",
        em.q_events_type_cooccurrence(spark, sf_dir),
        ["Join"],
        must_not=["CartesianProduct", "BroadcastNestedLoopJoin", "EvalPython"],
    )
    check(
        # tfidf: the only nested-loop join allowed is the ONE-ROW
        # broadcast of N; the tf⋈df join must be keyed, the per-doc
        # window must not collapse to SinglePartition (the 1-row count
        # agg is the single legitimate SinglePartition, asserted by
        # count).
        "tfidf_window_partitioned",
        em.q_text_tfidf_top_terms(spark, sf_dir),
        ["Window"],
        must_not=["CartesianProduct", "EvalPython"],
        max_counts={"SinglePartition": 1},
    )
    check(
        # as-of join is the union-merge plan: exactly ONE key exchange,
        # one partition-local sort + running window — never a join
        # operator at all (a range SortMergeJoin or nested loop would
        # mean the merge trick regressed).
        "asof_join_single_exchange",
        em.q_asof_join_events_orders(spark, sf_dir),
        ["Window"],
        must_not=[
            "SortMergeJoin",
            "CartesianProduct",
            "BroadcastNestedLoopJoin",
            "EvalPython",
        ],
        max_counts={"Exchange hashpartitioning": 1},
    )
    check(
        # keyless interval join must resolve to the bucketized
        # equi-join (hash join on _bucket with the containment as a
        # residual filter), never a nested-loop/cartesian pair blowup.
        "interval_join_bucketed_equi",
        em.q_interval_join_events(spark, sf_dir),
        ["BroadcastHashJoin"],
        must_not=["CartesianProduct", "BroadcastNestedLoopJoin", "EvalPython"],
    )
    check(
        # anomaly scoring: per-group moments BROADCAST back onto the
        # event scan (groups are dimension-sized), top-k via
        # TakeOrderedAndProject — no sort-merge shuffle join, no
        # global sort, no Python.
        "anomaly_broadcast_moments_topk",
        em.q_events_anomaly(spark, sf_dir),
        ["BroadcastHashJoin", "TakeOrderedAndProject"],
        must_not=["SortMergeJoin", "CartesianProduct", "EvalPython"],
    )
    check(
        # int8-SQ ANN: candidate scan ends in TakeOrderedAndProject
        # (per-partition top-k) — a global Sort for the candidate cut
        # would defeat the whole point; no Python in the scoring path.
        "sq_topk_take_ordered",
        em.q_similarity_sq_topk(spark, sf_dir),
        ["TakeOrderedAndProject"],
        must_not=["CartesianProduct", "BroadcastNestedLoopJoin", "EvalPython"],
    )
    check(
        # span dedup: the duplicated-gram set joins back by its md5
        # hash — keyed equi-joins only, no Python; the gram-count
        # shuffle is the one irreducible exchange.
        "span_dedup_keyed_joins_only",
        em.q_span_dup_stats(spark, sf_dir),
        ["HashAggregate"],
        must_not=["CartesianProduct", "BroadcastNestedLoopJoin", "EvalPython"],
    )
    check(
        # SemDeDup: the in-cluster pair stage must be a (cluster)-keyed
        # equi-join — an all-pairs fallback (cartesian / nested-loop)
        # would defeat the cluster-then-dedup point — and the whole op
        # stays JVM-side (integer k-means + Catalyst cosine).
        "semantic_dedup_cluster_keyed_pairs",
        em.q_semantic_dedup(spark, sf_dir),
        ["HashAggregate"],
        must_not=["CartesianProduct", "BroadcastNestedLoopJoin", "EvalPython"],
    )
    check(
        # DSIR: both bucket histograms (≤dim rows) and the two 1-row
        # totals must come back as broadcasts — a SortMergeJoin on
        # `bucket` would shuffle the full per-doc feature aggregate;
        # the whole scoring chain stays JVM-side.
        "dsir_broadcast_histograms",
        em.q_dsir_weights(spark, sf_dir),
        ["BroadcastHashJoin"],
        must_not=["SortMergeJoin", "CartesianProduct", "EvalPython"],
    )
    check(
        # conversation near-dup: pair generation is an inverted-index
        # equi-join on the turn-content hash — all-pairs fallbacks
        # (cartesian / nested-loop) would be quadratic in conversations.
        "conv_near_dup_keyed_joins_only",
        em.q_conv_near_dup(spark, sf_dir),
        ["HashAggregate"],
        must_not=["CartesianProduct", "EvalPython"],
    )
    check(
        # NPMI collocation: pairs come from ONE group-keyed self-join;
        # marginals and the 1-row N come back as broadcasts. A cartesian
        # or a SortMergeJoin on `item` would defeat both bounds; the
        # whole chain stays JVM-side.
        # (the 1-row N crossJoin plans as a BroadcastNestedLoopJoin with a
        # single-row inner side — the dsir-totals shape — so only true
        # cartesians are banned here.)
        "cooccur_npmi_keyed_join_broadcast_marginals",
        em.q_events_cooccur_npmi(spark, sf_dir),
        ["BroadcastHashJoin", "HashAggregate"],
        must_not=["CartesianProduct", "EvalPython"],
    )
    check(
        # Negative sampling: the replacement joins BROADCAST through the
        # dictionary index; the only shuffle is the (s, p, o) anti-join.
        # Per-row Python or a nested-loop join would put the 10^12-row
        # negative stream on the slow path.
        "negative_samples_broadcast_dictionary",
        em.q_kg_negative_samples(spark, sf_dir),
        ["BroadcastHashJoin"],
        must_not=["CartesianProduct", "BroadcastNestedLoopJoin", "EvalPython"],
    )
    # transcript sessionize: the lag window and the running gap-flag sum
    # share ONE conv_id exchange; the whole chain stays JVM-side.
    sz_plan = plan_of(em.q_transcript_sessionize(spark, sf_dir))
    n_ex = len(_re.findall(r"^\(\d+\) Exchange", sz_plan, _re.MULTILINE))
    if n_ex <= 1 and "EvalPython" not in sz_plan:
        print("PASS transcript_sessionize_single_exchange")
    else:
        failures.append(("transcript_sessionize_single_exchange", f"exchanges={n_ex}"))
        print(f"FAIL transcript_sessionize_single_exchange: exchanges={n_ex}")
    # SFT pair mining: the lead() windows share ONE conv_id exchange.
    sft_plan = plan_of(em.q_sft_pairs(spark, sf_dir))
    n_ex = len(_re.findall(r"^\(\d+\) Exchange", sft_plan, _re.MULTILINE))
    if n_ex <= 1 and "EvalPython" not in sft_plan:
        print("PASS sft_pairs_single_exchange")
    else:
        failures.append(("sft_pairs_single_exchange", f"exchanges={n_ex}"))
        print(f"FAIL sft_pairs_single_exchange: exchanges={n_ex}")
    # transcript stats: the lag window and the per-conv agg share ONE
    # conv_id hash exchange (window partition key == groupBy key) — a
    # second exchange would double-shuffle the 10^12-turn input.
    ts_plan = plan_of(em.q_transcript_stats(spark, sf_dir))
    n_ex = len(_re.findall(r"^\(\d+\) Exchange", ts_plan, _re.MULTILINE))
    if n_ex <= 1 and "EvalPython" not in ts_plan:
        print("PASS transcript_stats_single_exchange")
    else:
        failures.append(("transcript_stats_single_exchange", f"exchanges={n_ex}"))
        print(f"FAIL transcript_stats_single_exchange: exchanges={n_ex}")
    check(
        # BM25: top-k must be TakeOrderedAndProject (never a global
        # sort of the scored corpus); df joins broadcast; the whole
        # chain stays JVM-side. (The 1-row (N, Σdl) constants ride a
        # BroadcastNestedLoopJoin by design — build side is one row.)
        "bm25_take_ordered_broadcast_df",
        em.q_text_bm25_search(spark, sf_dir),
        ["TakeOrderedAndProject", "BroadcastHashJoin"],
        must_not=["CartesianProduct", "EvalPython"],
    )
    check(
        # Top n-grams: the Zipf head must collapse map-side (partial
        # HashAggregate before the exchange) and the cut must be
        # TakeOrderedAndProject.
        "top_ngrams_take_ordered_partial_agg",
        em.q_corpus_top_ngrams(spark, sf_dir),
        ["TakeOrderedAndProject", "HashAggregate"],
        must_not=["CartesianProduct", "EvalPython", "BroadcastNestedLoopJoin"],
    )
    check(
        # Markov transitions: marginals join BROADCAST (states² rows);
        # keyed joins only, JVM-side.
        "markov_broadcast_marginals",
        em.q_events_markov(spark, sf_dir),
        ["BroadcastHashJoin"],
        must_not=["CartesianProduct", "EvalPython", "BroadcastNestedLoopJoin"],
    )
    check(
        # LCC: triangle three-way join + degree agg stay keyed equi-
        # joins — a cartesian here is the classic O(V^2) trap.
        # (equi-join flavor — SortMergeJoin vs BroadcastHashJoin — is
        # AQE's call at this SF; the guard is the absence of the
        # non-keyed plans.)
        "graph_lcc_no_cartesian",
        em.q_graph_lcc(spark, sf_dir),
        ["HashAggregate"],
        must_not=["CartesianProduct", "EvalPython", "BroadcastNestedLoopJoin"],
    )
    check(
        # CUSUM: per-group totals join BROADCAST back onto the bucket
        # counts; two window functions, zero Python.
        "cusum_broadcast_totals",
        em.q_events_cusum(spark, sf_dir),
        ["BroadcastHashJoin", "Window"],
        must_not=["CartesianProduct", "EvalPython", "BroadcastNestedLoopJoin"],
    )
    # Beacon regularity: the lag window and the (user, type) aggregate
    # share ONE hash exchange — same discipline as transcript_stats.
    bc_plan = plan_of(em.q_events_beacons(spark, sf_dir))
    n_ex = len(_re.findall(r"^\(\d+\) Exchange", bc_plan, _re.MULTILINE))
    if n_ex <= 1 and "EvalPython" not in bc_plan:
        print("PASS beacons_single_exchange")
    else:
        failures.append(("beacons_single_exchange", f"exchanges={n_ex}"))
        print(f"FAIL beacons_single_exchange: exchanges={n_ex}")
    # Event-sequence mining: the n−1 lag columns must share ONE window
    # exchange (one Window operator), Zipf head collapses map-side, cut
    # is TakeOrderedAndProject.
    seq_plan = plan_of(em.q_events_top_sequences(spark, sf_dir))
    n_win = len(_re.findall(r"^\(\d+\) Window", seq_plan, _re.MULTILINE))
    if (
        n_win <= 2  # group window + the k-row rank window
        and "TakeOrderedAndProject" in seq_plan
        and "EvalPython" not in seq_plan
        and "CartesianProduct" not in seq_plan
    ):
        print("PASS top_sequences_shared_window_take_ordered")
    else:
        failures.append(("top_sequences_shared_window_take_ordered", f"windows={n_win}"))
        print(f"FAIL top_sequences_shared_window_take_ordered: windows={n_win}")
    check(
        # Gini: the rank window runs over the dimension-sized totals
        # frame (after the count agg), never the corpus; JVM-side.
        "gini_window_over_totals_only",
        em.q_corpus_source_gini(spark, sf_dir),
        ["HashAggregate", "Window"],
        must_not=["CartesianProduct", "EvalPython", "BroadcastNestedLoopJoin"],
    )
    check(
        # Reciprocity: the mutual test stays a keyed LeftSemi equi-join
        # on the swapped pair — never cartesian. (The final 1-row ×
        # 1-row crossJoin rides a BroadcastNestedLoopJoin by design,
        # build side is one row — same dispensation as BM25's
        # constants.)
        "reciprocity_keyed_semijoin",
        em.q_graph_reciprocity(spark, sf_dir),
        ["LeftSemi"],
        must_not=["CartesianProduct", "EvalPython"],
    )
    check(
        # Containment: candidate generation and exact-intersection
        # joins are keyed equi-joins (shingle / pair keys) — the
        # all-pairs cartesian is exactly what the inverted-index cap
        # exists to avoid; whole chain JVM-side.
        "containment_keyed_joins",
        em.q_ngram_containment(spark, sf_dir),
        ["HashAggregate"],
        must_not=["CartesianProduct", "EvalPython", "BroadcastNestedLoopJoin"],
    )
    check(
        # Correlation: per-group moments join BROADCAST (dimension-
        # sized), the pair space comes from the bucket-keyed self-join
        # — never cartesian. (The 1-row bucket-universe constant rides
        # a BNLJ by design — BM25-constants dispensation.)
        "correlation_broadcast_moments",
        em.q_events_correlation(spark, sf_dir),
        ["BroadcastHashJoin"],
        must_not=["CartesianProduct", "EvalPython"],
    )
    check(
        # Source overlap: the pair intersection is a hash-keyed
        # self-join; dimension-sized size tables join BROADCAST;
        # JVM-side throughout.
        "source_overlap_hash_keyed",
        em.q_source_overlap(spark, sf_dir),
        ["BroadcastHashJoin", "HashAggregate"],
        must_not=["CartesianProduct", "EvalPython", "BroadcastNestedLoopJoin"],
    )
    check(
        # BPE tokenize: per-doc word counts join the trained vocab on
        # the word hash key; JVM-side throughout (the delimiter-replace
        # merge is a codegen'd projection, never Python); no cartesian.
        "bpe_tokenize_hash_join_no_python",
        em.q_bpe_token_counts(spark, sf_dir),
        ["HashAggregate"],
        must_not=["CartesianProduct", "EvalPython", "BroadcastNestedLoopJoin"],
    )
    # Agent-trace triage family: loop detection must stay on ONE
    # conv_id exchange (lag window, run-id cumsum, per-run position
    # window, per-conv agg — the (conv, run) window key is a superset
    # of conv_id so only a local re-sort is added) with no self-join;
    # the whole family is JVM-side.
    lp_plan = plan_of(em.q_transcript_loops(spark, sf_dir))
    n_ex = len(_re.findall(r"^\(\d+\) Exchange", lp_plan, _re.MULTILINE))
    if n_ex <= 1 and "EvalPython" not in lp_plan and "Join" not in lp_plan:
        print("PASS transcript_loops_single_exchange_no_join")
    else:
        failures.append(
            ("transcript_loops_single_exchange_no_join", f"exchanges={n_ex}")
        )
        print(f"FAIL transcript_loops_single_exchange_no_join: exchanges={n_ex}")
    cg_plan = plan_of(em.q_transcript_context_growth(spark, sf_dir))
    n_ex = len(_re.findall(r"^\(\d+\) Exchange", cg_plan, _re.MULTILINE))
    if n_ex <= 1 and "EvalPython" not in cg_plan:
        print("PASS transcript_context_growth_single_exchange")
    else:
        failures.append(
            ("transcript_context_growth_single_exchange", f"exchanges={n_ex}")
        )
        print(
            f"FAIL transcript_context_growth_single_exchange: exchanges={n_ex}"
        )
    check(
        # Tool errors: scan-local regex filter + ONE map-side-combining
        # aggregate (the 2nd exchange is the exact-distinct conv count's
        # (tool, conv) pre-shuffle — inherent to exactness); tool chains:
        # the family's conv_id lag window + the |tools|²-row transition
        # aggregate. Both JVM-side, never cartesian.
        "tool_errors_jvm_side",
        em.q_transcript_tool_errors(spark, sf_dir),
        ["HashAggregate"],
        must_not=["EvalPython", "CartesianProduct", "SortMergeJoin"],
    )
    check(
        "tool_chains_jvm_side",
        em.q_transcript_tool_chains(spark, sf_dir),
        ["HashAggregate"],
        must_not=["EvalPython", "CartesianProduct", "SortMergeJoin"],
    )
    check(
        # Line dedup: ONE md5-keyed count+min aggregation, keyed join
        # back, per-doc ordered rejoin (sort_array inside the agg) —
        # JVM-side, never cartesian, and NO full-corpus window (the
        # first-occurrence pick is the min-struct aggregate, not a
        # rank over every line).
        "line_dedup_keyed_join_no_window",
        em.q_line_dedup(spark, sf_dir),
        ["HashAggregate"],
        must_not=["EvalPython", "CartesianProduct", "Window"],
    )
    check(
        # Outcomes: loop_detection's conv_id window family + max_by
        # aggregates + conv_id-keyed verdict joins; JVM-side, never
        # cartesian.
        "transcript_outcomes_keyed_joins",
        em.q_transcript_outcomes(spark, sf_dir),
        ["HashAggregate"],
        must_not=["EvalPython", "CartesianProduct"],
    )
    check(
        # Assortativity: keyed degree equi-joins + 1-row aggregates
        # (the 1-row×1-row combine broadcasts; a row-explosive
        # cartesian never appears).
        "assortativity_keyed_joins",
        em.q_graph_assortativity(spark, sf_dir),
        ["HashAggregate"],
        must_not=["EvalPython", "CartesianProduct"],
    )
    check(
        # Fertility: scan-local regex token count + ONE map-side-
        # combining aggregate to <= |sources| rows; family histogram:
        # two cascaded integer aggregates (hash keys only), no window,
        # no join at all.
        "corpus_fertility_single_agg",
        em.q_corpus_fertility(spark, sf_dir),
        ["HashAggregate"],
        must_not=["EvalPython", "CartesianProduct", "Window", "Join"],
    )
    check(
        "dedup_family_sizes_cascaded_aggs",
        em.q_dedup_family_sizes(spark, sf_dir),
        ["HashAggregate"],
        must_not=["EvalPython", "CartesianProduct", "Window", "Join"],
    )
    check(
        # Gopher rules: one codegen'd projection — split/regexp/length
        # arithmetic on the row, no exchange at all.
        "gopher_rules_scan_local",
        em.q_gopher_rules(spark, sf_dir),
        ["Project"],
        must_not=["EvalPython", "CartesianProduct", "Window", "Join",
                  "Exchange"],
    )
    check(
        # Triple P/R: the composite-key join against the gold slice
        # must honor the explicit broadcast hint (gold is labeled data,
        # small by construction) — never a sort-merge of the corpus.
        "eval_triple_pr_broadcast_gold",
        em.q_eval_triple_pr(spark, sf_dir),
        ["BroadcastHashJoin"],
        must_not=["EvalPython", "CartesianProduct", "SortMergeJoin"],
    )
    check(
        # Pairwise clustering P/R via contingency cells: keyed
        # count-aggs only — the item table is never joined with itself,
        # so a hot mega-cluster cannot explode the plan. (The three
        # 1-row metric frames combine via broadcast nested loop, which
        # is 1-row x 1-row — cheap; a CartesianProduct over row data
        # must not appear.)
        "eval_cluster_pairwise_no_pair_explosion",
        em.q_eval_cluster_pairwise(spark, sf_dir),
        ["HashAggregate"],
        must_not=["EvalPython", "CartesianProduct"],
    )
    # Preference mining: the chosen/rejected rank windows and their
    # group aggregates must SHARE the prompt exchange (window partition
    # key == groupBy key — one shuffle per side, then the prompt-keyed
    # join); everything JVM-side, never cartesian.
    dpo_plan = plan_of(em.q_dpo_pairs(spark, sf_dir))
    n_prompt_ex = len(
        _re.findall(
            r"^\(\d+\) Exchange hashpartitioning\(prompt", dpo_plan, _re.MULTILINE
        )
    )
    if (
        n_prompt_ex <= 3  # chosen side, rejected side, (AQE may reuse)
        and "EvalPython" not in dpo_plan
        and "CartesianProduct" not in dpo_plan
    ):
        print("PASS dpo_pairs_shared_prompt_exchange")
    else:
        failures.append(
            ("dpo_pairs_shared_prompt_exchange", f"prompt_exchanges={n_prompt_ex}")
        )
        print(f"FAIL dpo_pairs_shared_prompt_exchange: prompt_exchanges={n_prompt_ex}")
    bon_plan = plan_of(em.q_best_of_n_pairs(spark, sf_dir))
    n_prompt_ex = len(
        _re.findall(
            r"^\(\d+\) Exchange hashpartitioning\(prompt", bon_plan, _re.MULTILINE
        )
    )
    if (
        n_prompt_ex <= 1
        and "EvalPython" not in bon_plan
        and "Join" not in bon_plan
    ):
        print("PASS best_of_n_single_prompt_exchange")
    else:
        failures.append(
            ("best_of_n_single_prompt_exchange", f"prompt_exchanges={n_prompt_ex}")
        )
        print(f"FAIL best_of_n_single_prompt_exchange: prompt_exchanges={n_prompt_ex}")
    # 60: bigram LM stays JVM-side — no Python eval, hash (not sort)
    # aggregates throughout, and no cartesian anywhere in the two
    # model joins.
    check(
        "bigram_logprob_jvm_only",
        em.q_text_bigram_logprob(spark, sf_dir),
        ["HashAggregate"],
        must_not=["EvalPython", "SortAggregate", "CartesianProduct"],
    )
    # 61: datasheet avoids the multi-distinct expand — three separate
    # map-side-distinct aggregates, so no Expand node in the plan, and
    # no Python eval.
    check(
        "source_datasheet_no_expand",
        em.q_source_datasheet(spark, sf_dir),
        ["HashAggregate"],
        must_not=["Expand", "EvalPython", "CartesianProduct"],
    )
    # 62: curriculum assignment is a pure scan-local projection — the
    # boundary collect happens at build time; the returned frame must
    # have NO sort, exchange, join, or aggregate (a global-ntile
    # implementation would show a SinglePartition sort here).
    check(
        "curriculum_scan_local_assignment",
        em.q_curriculum_order(spark, sf_dir),
        ["Scan parquet"],
        must_not=["Sort", "Exchange", "Join", "HashAggregate", "EvalPython"],
    )
    # 63: bag-of-words dedup = ONE 32-byte-key exchange (plus AQE
    # union reads), fingerprint scan-local, no Python.
    check(
        "dedup_bow_single_hash_exchange",
        em.q_dedup_bow(spark, sf_dir),
        ["HashAggregate"],
        must_not=["EvalPython", "SortAggregate", "CartesianProduct"],
        max_counts={"Exchange hashpartitioning": 1},
    )
    # 64: prefix-filter Jaccard join — keyed equi-joins only (the
    # candidate join keys on prefix tokens, verification on ids); a
    # naive all-pairs implementation would show CartesianProduct or
    # BroadcastNestedLoopJoin here.
    check(
        "jaccard_prefix_join_no_cartesian",
        em.q_jaccard_prefix_join(spark, sf_dir),
        ["HashAggregate"],
        must_not=[
            "CartesianProduct",
            "BroadcastNestedLoopJoin",
            "EvalPython",
        ],
    )
    # 65: paragraph dedup — boilerplate set joins back by hash key as
    # a LeftAnti (never a collect/broadcast-literal filter), reassembly
    # is a keyed aggregate; no Python anywhere.
    check(
        "paragraph_dedup_anti_join",
        em.q_dedup_paragraphs(spark, sf_dir),
        ["LeftAnti", "HashAggregate"],
        must_not=["EvalPython", "CartesianProduct", "BroadcastNestedLoopJoin"],
    )
    # 66: sorted-neighborhood pair generation is a keyed equi-join on
    # the rank block (never a cartesian/range join), rank windows are
    # bucket-partitioned (no SinglePartition global window: the plan's
    # Sort nodes are all preceded by a hashpartitioning exchange).
    check(
        "snm_keyed_block_join",
        em.q_er_sorted_neighborhood(spark, sf_dir),
        ["Window"],
        must_not=[
            "CartesianProduct",
            "BroadcastNestedLoopJoin",
            "EvalPython",
            "Exchange SinglePartition",
        ],
    )
    # 67: schema audit — signature lookup is a broadcast hash join
    # against the <= ~20-row rule expansion; endpoint labeling is keyed
    # equi-joins; no Python, no cartesian.
    check(
        "schema_audit_broadcast_sigs",
        em.q_kg_schema_audit(spark, sf_dir),
        ["BroadcastHashJoin"],
        must_not=["CartesianProduct", "BroadcastNestedLoopJoin", "EvalPython"],
    )
    # 68: SCD2 intervals — the lag window, run cumsum, run aggregate
    # and valid_to lead window all cluster on (subj, pred): ONE hash
    # exchange (HashPartitioning(subj,pred) satisfies the superset-key
    # aggregate's clustering), local re-sorts only, no Python.
    check(
        "scd2_single_key_exchange",
        em.q_kg_scd2_intervals(spark, sf_dir),
        ["Window", "HashAggregate"],
        must_not=["EvalPython", "CartesianProduct"],
        max_counts={"Exchange hashpartitioning": 1},
    )
    # 69: ER verify — Levenshtein scoring is pure codegen over the
    # blocked candidates (keyed joins only; a per-row Python scorer or
    # an all-pairs join would show here).
    check(
        "er_verify_jvm_only",
        em.q_er_verified_matches(spark, sf_dir),
        ["levenshtein"],
        must_not=["EvalPython", "CartesianProduct", "BroadcastNestedLoopJoin"],
    )
    # 70: temporal two-hop — ONE keyed equi-join on the pivot node
    # with the causal ts inequality as a join residual, never a
    # cartesian/range join.
    check(
        "temporal_two_hop_keyed_join",
        em.q_kg_temporal_two_hop(spark, sf_dir),
        ["Join"],
        must_not=["EvalPython", "CartesianProduct", "BroadcastNestedLoopJoin"],
    )
    # 71: corroboration — one triple-keyed aggregate chain (partial
    # countDistinct), pure JVM.
    check(
        "corroboration_partial_agg",
        em.q_kg_corroboration(spark, sf_dir),
        ["HashAggregate"],
        must_not=["EvalPython", "CartesianProduct", "SortAggregate"],
    )
    # 72: readability is a pure scan-local codegen'd projection —
    # three regexp counts, no exchange/join/agg/Python anywhere.
    check(
        "readability_scan_local",
        em.q_text_readability(spark, sf_dir),
        ["Scan parquet"],
        must_not=["Exchange", "Join", "HashAggregate", "EvalPython", "Sort"],
    )
    # 73: weighted sampling is priority projection + ONE
    # TakeOrderedAndProject (never a global sort/window over the
    # corpus); the rank window runs over the k surviving rows only, so
    # the plan has NO exchange at all in local mode.
    plan = plan_of(em.q_sample_weighted(spark, sf_dir))
    import re as _re2

    n_ex = len(_re2.findall(r"^\(\d+\) Exchange", plan, _re2.M))
    if (
        "TakeOrderedAndProject" in plan
        and "EvalPython" not in plan
        and n_ex == 0
    ):
        print("PASS weighted_sample_take_ordered")
    else:
        failures.append(("weighted_sample_take_ordered", f"exchanges={n_ex}"))
        print(f"FAIL weighted_sample_take_ordered: exchanges={n_ex}")
    # 74: seasonality — (group, hour) count-agg exchange, then the
    # window max and the final aggregate SHARE one group-keyed
    # exchange: exactly two exchange nodes, hash aggregates, no
    # Python.
    plan = plan_of(em.q_events_seasonality(spark, sf_dir))
    n_ex = len(_re2.findall(r"^\(\d+\) Exchange", plan, _re2.M))
    if (
        n_ex <= 2
        and "EvalPython" not in plan
        and "SortAggregate" not in plan
    ):
        print("PASS seasonality_two_exchanges")
    else:
        failures.append(("seasonality_two_exchanges", f"exchanges={n_ex}"))
        print(f"FAIL seasonality_two_exchanges: exchanges={n_ex}")
    # 75: transitivity — the audited canonical three-way triangle join
    # (keyed equi-joins only; the only nested-loop joins are the final
    # 1-row × 1-row stat combines), exact-integer wedge aggregate.
    check(
        "transitivity_keyed_joins",
        em.q_graph_transitivity(spark, sf_dir),
        ["HashAggregate"],
        must_not=["CartesianProduct", "EvalPython", "SortAggregate"],
    )
    # 76: rank_eval — BM25 rankers bound the data (TakeOrdered), the
    # hits window and per-query aggregate run over <= k rows per
    # query, everything JVM-side.
    check(
        "rank_eval_jvm_only",
        em.q_search_rank_eval(spark, sf_dir),
        ["TakeOrderedAndProject", "Window"],
        must_not=["CartesianProduct", "EvalPython"],
    )
    # 77: rich-club — the ordered window runs over the MERGED DEGREE
    # HISTOGRAM (dimension-sized), never the graph; joins are keyed.
    check(
        "rich_club_histogram_window",
        em.q_graph_rich_club(spark, sf_dir),
        ["Window", "HashAggregate"],
        must_not=["CartesianProduct", "EvalPython"],
    )
    # 78: average neighbor degree — degree agg + one keyed join + one
    # node-keyed sum, all JVM-side.
    check(
        "avg_nbr_deg_keyed_joins",
        em.q_graph_avg_nbr_deg(spark, sf_dir),
        ["HashAggregate"],
        must_not=[
            "CartesianProduct",
            "BroadcastNestedLoopJoin",
            "EvalPython",
            "SortAggregate",
        ],
    )
    # 79: k-anonymity audit — ONE map-side-combining count aggregate +
    # scan-local filter; a single quasi-key exchange.
    plan = plan_of(em.q_events_k_anonymity(spark, sf_dir))
    n_ex = len(_re2.findall(r"^\(\d+\) Exchange", plan, _re2.M))
    if n_ex <= 1 and "EvalPython" not in plan and "Join" not in plan:
        print("PASS k_anonymity_single_exchange")
    else:
        failures.append(("k_anonymity_single_exchange", f"exchanges={n_ex}"))
        print(f"FAIL k_anonymity_single_exchange: exchanges={n_ex}")
    # 80: trimmed mean — the rank window and the final aggregate share
    # ONE group-keyed exchange (the exact_percentiles discipline), no
    # global sort, no Python.
    plan = plan_of(em.q_events_trimmed_mean(spark, sf_dir))
    n_ex = len(_re2.findall(r"^\(\d+\) Exchange", plan, _re2.M))
    if (
        n_ex <= 1
        and "EvalPython" not in plan
        and "Exchange SinglePartition" not in plan
    ):
        print("PASS trimmed_mean_single_exchange")
    else:
        failures.append(("trimmed_mean_single_exchange", f"exchanges={n_ex}"))
        print(f"FAIL trimmed_mean_single_exchange: exchanges={n_ex}")
    # 81: l-diversity — the two-phase distinct aggregate only (quasi +
    # (quasi, sensitive) partials), no join, no Python.
    plan = plan_of(em.q_events_l_diversity(spark, sf_dir))
    n_ex = len(_re2.findall(r"^\(\d+\) Exchange", plan, _re2.M))
    if n_ex <= 2 and "EvalPython" not in plan and "Join" not in plan:
        print("PASS l_diversity_two_phase_distinct")
    else:
        failures.append(("l_diversity_two_phase_distinct", f"exchanges={n_ex}"))
        print(f"FAIL l_diversity_two_phase_distinct: exchanges={n_ex}")
    # 82: sliding-rate profile — the RANGE-frame window and the
    # per-user aggregate share ONE user-keyed exchange; integer frame
    # key, no Python.
    plan = plan_of(em.q_events_rate_peaks(spark, sf_dir))
    n_ex = len(_re2.findall(r"^\(\d+\) Exchange", plan, _re2.M))
    if (
        n_ex <= 1
        and "EvalPython" not in plan
        and "Exchange SinglePartition" not in plan
    ):
        print("PASS rate_peaks_single_exchange")
    else:
        failures.append(("rate_peaks_single_exchange", f"exchanges={n_ex}"))
        print(f"FAIL rate_peaks_single_exchange: exchanges={n_ex}")
    # 83: HLL overlap — the checkpointed sketch means the RAW corpus
    # is scanned at most once in the pair plan (zero parquet scans
    # after the eager checkpoint), and the pair join is a register
    # equi-join, never cartesian.
    plan = plan_of(em.q_hll_user_overlap(spark, sf_dir))
    n_scan = len(_re2.findall(r"^\(\d+\) Scan parquet", plan, _re2.M))
    if (
        n_scan <= 1
        and "CartesianProduct" not in plan
        and "EvalPython" not in plan
    ):
        print("PASS hll_overlap_single_corpus_scan")
    else:
        failures.append(("hll_overlap_single_corpus_scan", f"scans={n_scan}"))
        print(f"FAIL hll_overlap_single_corpus_scan: scans={n_scan}")
    # 87: Kaplan-Meier — keyed min-aggregates + a 1-row broadcast
    # horizon; the curve windows run over the day table (dimension-
    # sized by the horizon), everything JVM-side.
    check(
        "survival_jvm_only",
        em.q_events_survival(spark, sf_dir),
        ["Window", "HashAggregate"],
        must_not=["CartesianProduct", "EvalPython", "SortAggregate"],
    )
    # 88: percent-rank normalization — ONE group-keyed window
    # exchange, scan-local otherwise, no aggregate, no Python.
    plan = plan_of(em.q_events_value_pct(spark, sf_dir))
    n_ex = len(_re2.findall(r"^\(\d+\) Exchange", plan, _re2.M))
    if (
        n_ex <= 1
        and "EvalPython" not in plan
        and "HashAggregate" not in plan
        and "Exchange SinglePartition" not in plan
    ):
        print("PASS value_pct_single_window_exchange")
    else:
        failures.append(("value_pct_single_window_exchange", f"exchanges={n_ex}"))
        print(f"FAIL value_pct_single_window_exchange: exchanges={n_ex}")
    # 89: reciprocal best match — candidate generation is the audited
    # batch_topk broadcast score matrix; the mutuality check itself is
    # windows + ONE keyed equi-join on the reversed pair, never a
    # cartesian, all JVM-side.
    check(
        "mutual_best_keyed_mutuality",
        em.q_similarity_mutual_best(spark, sf_dir),
        ["Window"],
        must_not=["CartesianProduct", "EvalPython"],
    )
    # 90: calibration table — scan-local fixed-pointing + ONE
    # map-side-combining aggregate over <= n_bins groups; no join, no
    # Python.
    plan = plan_of(em.q_eval_calibration(spark, sf_dir))
    n_ex = len(_re2.findall(r"^\(\d+\) Exchange", plan, _re2.M))
    if n_ex <= 1 and "EvalPython" not in plan and "Join" not in plan:
        print("PASS calibration_single_aggregate")
    else:
        failures.append(("calibration_single_aggregate", f"exchanges={n_ex}"))
        print(f"FAIL calibration_single_aggregate: exchanges={n_ex}")
    # 91: Hill tail — two histogram aggregates then a 1-row stat; all
    # hash aggregates, no Python, no cartesian.
    check(
        "hill_tail_histogram_aggs",
        em.q_graph_hill_tail(spark, sf_dir),
        ["HashAggregate"],
        must_not=["CartesianProduct", "EvalPython", "SortAggregate"],
    )
    # 92: ROC-AUC — distinct-score aggregate, then the cumulative-rank
    # window over the quantization-bounded group table, then one global
    # agg; no join, no Python.
    check(
        "roc_auc_rank_window",
        em.q_eval_roc_auc(spark, sf_dir),
        ["HashAggregate", "Window"],
        must_not=["CartesianProduct", "EvalPython", "Join"],
    )
    # 93: PR curve — ONE bucket aggregate joined onto the n-row dense
    # threshold spine (a Range source, dimension-sized), then windows
    # over exactly n_thresholds rows; no Python, no cartesian.
    plan = plan_of(em.q_eval_pr_curve(spark, sf_dir))
    if (
        "EvalPython" not in plan
        and "CartesianProduct" not in plan
        and "Range" in plan
    ):
        print("PASS pr_curve_bucket_cumulation")
    else:
        failures.append(("pr_curve_bucket_cumulation", "shape"))
        print("FAIL pr_curve_bucket_cumulation: shape")
    # 94: dyadic EWMA — one (group, bucket) count aggregate, then ONE
    # group-keyed window (all L lags share a single sort); no join, no
    # Python, no single-partition exchange.
    plan = plan_of(em.q_events_ewma_hourly(spark, sf_dir))
    n_win = len(_re2.findall(r"^\(\d+\) Window", plan, _re2.M))
    if (
        n_win == 1
        and "EvalPython" not in plan
        and "Join" not in plan
        and "Exchange SinglePartition" not in plan
    ):
        print("PASS ewma_single_group_window")
    else:
        failures.append(("ewma_single_group_window", f"windows={n_win}"))
        print(f"FAIL ewma_single_group_window: windows={n_win}")
    # 95: Simpson — two map-side-combining aggregates, nothing else.
    check(
        "simpson_two_aggregates",
        em.q_events_simpson(spark, sf_dir),
        ["HashAggregate"],
        must_not=["CartesianProduct", "EvalPython", "Join", "Window"],
    )
    # 96: nearest-event join — the union-merge plan: ONE key exchange,
    # one sort, two windows, NO join node (the oracle uses a brute
    # join; the operator must not).
    plan = plan_of(em.q_events_nearest_click(spark, sf_dir))
    n_ex = len(_re2.findall(r"^\(\d+\) Exchange", plan, _re2.M))
    if n_ex == 1 and "Join" not in plan and "EvalPython" not in plan:
        print("PASS nearest_join_union_merge")
    else:
        failures.append(("nearest_join_union_merge", f"exchanges={n_ex}"))
        print(f"FAIL nearest_join_union_merge: exchanges={n_ex}")
    # 97: soft-dedup weights — ONE md5-keyed window exchange (no
    # groupBy+rejoin), text dropped before the shuffle, no Python.
    plan = plan_of(em.q_dedup_soft_weights(spark, sf_dir))
    n_ex = len(_re2.findall(r"^\(\d+\) Exchange", plan, _re2.M))
    if n_ex == 1 and "Join" not in plan and "EvalPython" not in plan:
        print("PASS soft_dedup_single_window_exchange")
    else:
        failures.append(("soft_dedup_single_window_exchange", f"exchanges={n_ex}"))
        print(f"FAIL soft_dedup_single_window_exchange: exchanges={n_ex}")
    # 98: TextRank — scan-local pair generation (token arrays never
    # shuffle), keyed joins for the rank loop, TakeOrderedAndProject
    # for the top-k; no Python, no cartesian.
    check(
        "textrank_jvm_topk",
        em.q_text_textrank(spark, sf_dir),
        ["TakeOrderedAndProject"],
        must_not=["CartesianProduct", "EvalPython"],
    )
    # 99: best-lag correlation — bucket-keyed co-activity join with
    # bounded lag fan-out; the lag table and moments broadcast; no
    # cartesian between data-sized frames, no Python.
    check(
        "best_lag_keyed_joins",
        em.q_events_best_lag(spark, sf_dir),
        ["HashAggregate", "Window"],
        must_not=["CartesianProduct", "EvalPython"],
    )
    # 100: seasonal surge — one cell count, dimension-sized baseline
    # re-agg joined back broadcast, 1-row week count; no window, no
    # Python, no sort aggregate.
    check(
        "seasonal_surge_broadcast_baseline",
        em.q_events_seasonal_surge(spark, sf_dir),
        ["HashAggregate", "BroadcastHashJoin"],
        must_not=["CartesianProduct", "EvalPython", "Window", "SortAggregate"],
    )
    # 101: DP counts — ONE keyed count + scan-local noise projection;
    # no join, no window, no Python.
    check(
        "dp_counts_single_aggregate",
        em.q_events_dp_counts(spark, sf_dir),
        ["HashAggregate"],
        must_not=["CartesianProduct", "EvalPython", "Join", "Window"],
    )
    # 102: refusal profile — scan-local contains projection + ONE
    # keyed aggregate; no join, no window, no Python.
    check(
        "refusal_single_aggregate",
        em.q_transcript_refusals(spark, sf_dir),
        ["HashAggregate"],
        must_not=["CartesianProduct", "EvalPython", "Join", "Window"],
    )
    # 103: cluster-balanced sample — the audited kmeans joins plus ONE
    # cluster-keyed window; no Python, no cartesian.
    check(
        "cluster_balanced_window_draw",
        em.q_sample_cluster_balanced(spark, sf_dir),
        ["Window"],
        must_not=["CartesianProduct", "EvalPython"],
    )
    # 104: vocab richness — two cascaded aggregates + a 1-row stat; no
    # join, no window, no Python.
    check(
        "vocab_richness_cascaded_aggs",
        em.q_text_vocab_richness(spark, sf_dir),
        ["HashAggregate"],
        must_not=["CartesianProduct", "EvalPython", "Join", "Window"],
    )
    # 105: profile drift — one aggregate pass per batch (the
    # multi-distinct expand is schema-bounded) + a schema-sized join;
    # no window, no Python, no cartesian.
    check(
        "profile_drift_schema_sized",
        em.q_events_profile_drift(spark, sf_dir),
        ["HashAggregate"],
        must_not=["CartesianProduct", "EvalPython", "Window"],
    )
    # 106: stylometry — vocabulary-keyed counts, one ordered top-m cut,
    # then S×m-grid joins; no Python. (The totals × top-m cross join is
    # dimension × dimension — the one sanctioned cartesian shape.)
    check(
        "stylometry_grid_joins",
        em.q_text_stylometry(spark, sf_dir),
        ["HashAggregate"],
        must_not=["EvalPython", "SortAggregate"],
    )
    # 107: robust trend — group-keyed pair self-join (documented
    # quadratic fan-out in BUCKET count, not rows) + keyed aggs and
    # the median window; no Python, no cartesian.
    check(
        "robust_trend_keyed_pairs",
        em.q_events_robust_trend(spark, sf_dir),
        ["HashAggregate", "Window"],
        must_not=["CartesianProduct", "EvalPython"],
    )
    # 108: KS drift — one value-keyed count, the distinct-value
    # cumulative window, one TakeOrdered argmax; no join, no Python.
    check(
        "ks_drift_cumulative_argmax",
        em.q_events_ks_drift(spark, sf_dir),
        ["HashAggregate", "Window", "TakeOrderedAndProject"],
        must_not=["CartesianProduct", "EvalPython", "Join"],
    )
    spark.stop()
    print(f"\n{'OK' if not failures else 'FAILURES: ' + str(failures)}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"))
