"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship KG query end-to-end on sf0.001.
``queries()``/``oracle_sql()`` pair every SQL-expressible operator from
SURVEY.md §2 with a DuckDB oracle. Strategy for the KG-specific operators:
the sf tables carry no IOCs, so several queries *construct* deterministic
CTI-shaped text from table keys (same arithmetic on both sides), run the
real Spark operator/kernel over it, while the oracle derives the expected
result analytically — an independent end-to-end check, not a replay.

Column names/aliases are kept identical between each query and its
oracle; doubles are rounded before comparison (sum-order differs across
engines).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from threat_intelligence_knowledge_graph_spark.operators.chunker import chunk_documents
from threat_intelligence_knowledge_graph_spark.operators.dedup import (
    minhash_near_duplicates,
    simhash_signatures_df,
)
from threat_intelligence_knowledge_graph_spark.operators.extraction import (
    extract_graph_records,
)
from threat_intelligence_knowledge_graph_spark.operators.text_quality import (
    BPE_TOKEN_REGEX,
    LANG_STOPWORDS,
    STOPWORDS_EN,
    fingerprints,
    language_id,
    quality_score,
    tfidf_top_terms,
    token_counts,
)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# Constructed CTI corpus from `orders` (both engines build identical text).
# ---------------------------------------------------------------------------

def _cti_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    k = F.col("o_orderkey").cast("string")
    a = (F.col("o_orderkey") % 250).cast("string")
    b = ((F.col("o_orderkey") * 7) % 250).cast("string")
    c = ((F.col("o_orderkey") % 249) + 1).cast("string")
    text = F.concat(
        F.lit("The domain evil-"), k, F.lit(".example.net resolves to 10."),
        a, F.lit("."), b, F.lit("."), c, F.lit(" now. "),
        F.lit("Fetched https://evil-"), k, F.lit(".example.net/p"), k,
        F.lit(" today. "),
        F.lit("Order exploits CVE-2021-"),
        ((F.col("o_orderkey") % 9000) + 1000).cast("string"),
        F.lit(" and CVE-2017-0144 today."),
    )
    return o.select(k.alias("conv_id"), text.alias("doc_text"))


_CTI_TEXT_SQL = """
    SELECT cast(o_orderkey AS varchar) AS doc_id,
           'The domain evil-' || cast(o_orderkey AS varchar)
           || '.example.net resolves to 10.'
           || cast(o_orderkey % 250 AS varchar) || '.'
           || cast((o_orderkey * 7) % 250 AS varchar) || '.'
           || cast((o_orderkey % 249) + 1 AS varchar) || ' now. '
           || 'Fetched https://evil-' || cast(o_orderkey AS varchar)
           || '.example.net/p' || cast(o_orderkey AS varchar) || ' today. '
           || 'Order exploits CVE-2021-'
           || cast((o_orderkey % 9000) + 1000 AS varchar)
           || ' and CVE-2017-0144 today.' AS text
    FROM orders
"""

_IPV4_SIMPLE = r"(?:(?:25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\.){3}(?:25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])"
_CVE_RX = r"CVE-[0-9]{4}-[0-9]{4,7}"

# Planted 30-node test graph shared by the k-core and harmonic-closeness
# entries AND their SQL oracles (one definition each side — an edit to
# the topology desynchronizing operator vs oracle was the r5 review's
# drift-trap finding): an open chain n0—n1—…—n24 plus region edges
# n_i—r_(i%5) for i < 10.
_CHAIN_REGION_EDGES_SQL = """
          SELECT 'n' || cast(n_nationkey AS varchar) AS src,
                 'n' || cast(n_nationkey + 1 AS varchar) AS dst
          FROM nation WHERE n_nationkey < 24
          UNION ALL
          SELECT 'n' || cast(n_nationkey AS varchar),
                 'r' || cast(n_nationkey % 5 AS varchar)
          FROM nation WHERE n_nationkey < 10
"""


def _chain_region_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of ``_CHAIN_REGION_EDGES_SQL`` (directed src→dst)."""
    nat = _t(spark, sf_dir, "nation").select("n_nationkey")
    nkey = F.concat(F.lit("n"), F.col("n_nationkey").cast("string"))
    chain = nat.filter(F.col("n_nationkey") < 24).select(
        nkey.alias("src"),
        F.concat(F.lit("n"), (F.col("n_nationkey") + 1).cast("string")).alias(
            "dst"
        ),
    )
    reg = nat.filter(F.col("n_nationkey") < 10).select(
        nkey.alias("src"),
        F.concat(F.lit("r"), (F.col("n_nationkey") % 5).cast("string")).alias(
            "dst"
        ),
    )
    return chain.union(reg)

def _html_to_text_oracle_sql() -> str:
    from threat_intelligence_knowledge_graph_spark.sources.html import (
        html_to_text_sql,
    )

    html_expr = (
        "'<html><head><style>body{color:red}</style></head><body>'"
        " || '<script>var x = 1 < 2;</script>'"
        " || '<article><h1>Report ' || cast(o_orderkey AS varchar) || '</h1>'"
        " || '<p>Priority &amp; status: ' || o_orderpriority"
        " || '</p><!-- hidden --><p>Customer &lt;'"
        " || cast(o_custkey AS varchar)"
        " || '&gt;</p></article>'"
        " || '<footer>ignored? no — body fallback only</footer></body></html>'"
    )
    return f"""
        SELECT o_orderkey AS doc_id,
               {html_to_text_sql(f"({html_expr})")} AS text
        FROM orders
    """


_KERNEL_NODES_SQL = """
    SELECT 'Domain' AS node_label,
           'Domain_Evil-' || cast(o_orderkey AS varchar) || '_Example_Net' AS node_id
    FROM orders
    UNION
    SELECT 'Ipv4' AS node_label,
           'Ipv4_10_' || cast(o_orderkey % 250 AS varchar) || '_'
             || cast((o_orderkey * 7) % 250 AS varchar) || '_'
             || cast((o_orderkey % 249) + 1 AS varchar) AS node_id
    FROM orders
    UNION
    SELECT 'Url' AS node_label,
           'Url_Https___Evil-' || cast(o_orderkey AS varchar)
             || '_Example_Net_P' || cast(o_orderkey AS varchar) AS node_id
    FROM orders
    UNION
    SELECT 'Vulnerability' AS node_label,
           'Vulnerability_Cve-2021-' || cast((o_orderkey % 9000) + 1000 AS varchar) AS node_id
    FROM orders
    UNION
    SELECT 'Vulnerability' AS node_label,
           'Vulnerability_Cve-2017-0144' AS node_id
    FROM orders
"""


def _uuid_sql(expr: str) -> str:
    """SQL for the UUID-shaped 8-4-4-4-12 rendering of md5(expr) — the
    oracle twin of operators/stix_export._uuidish."""
    h = f"md5({expr})"
    return (
        f"substr({h}, 1, 8) || '-' || substr({h}, 9, 4) || '-' || "
        f"substr({h}, 13, 4) || '-' || substr({h}, 17, 4) || '-' || "
        f"substr({h}, 21, 12)"
    )


_KERNEL_TRIPLES_SQL = """
    SELECT 'Domain_Evil-' || cast(o_orderkey AS varchar) || '_Example_Net' AS subj,
           'RESOLVES_TO' AS pred,
           'Ipv4_10_' || cast(o_orderkey % 250 AS varchar) || '_'
             || cast((o_orderkey * 7) % 250 AS varchar) || '_'
             || cast((o_orderkey % 249) + 1 AS varchar) AS obj
    FROM orders
    UNION
    SELECT 'Url_Https___Evil-' || cast(o_orderkey AS varchar)
             || '_Example_Net_P' || cast(o_orderkey AS varchar) AS subj,
           'CONTAINS' AS pred,
           'Domain_Evil-' || cast(o_orderkey AS varchar) || '_Example_Net' AS obj
    FROM orders
"""


# ---------------------------------------------------------------------------
# queries()
# ---------------------------------------------------------------------------

def q_kg_chunks(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("conv_id"), F.col("text").alias("doc_text")
    )
    return chunk_documents(docs, 100, 10).select(
        F.col("conv_id").alias("doc_id"),
        "chunk_index",
        "total_chunks",
        "chunk_text",
    )


def q_kg_node_ids(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    node_type = (
        F.when(F.col("doc_id") % 3 == 0, "Domain")
        .when(F.col("doc_id") % 3 == 1, "IPv4")
        .otherwise("URL")
    )
    value = F.concat(
        F.lit("val-"), F.col("doc_id").cast("string"), F.lit("/x."),
        (F.col("doc_id") % 7).cast("string"),
    )
    return d.select(
        "doc_id",
        node_type.alias("node_type"),
        F.concat(
            F.lower(node_type), F.lit("_"),
            F.regexp_replace(value, r"[^a-zA-Z0-9_-]", "_"),
        ).alias("node_id"),
    )


def q_kg_ioc_typing(spark, sf_dir):
    from threat_intelligence_knowledge_graph_spark.rules.mappings import (
        IOC_TO_ENTITY_TYPE,
    )

    d = _t(spark, sf_dir, "documents")
    classes = ["domains", "md5s", "cves", "urls", "ipv4s", "not_a_class", "asns"]
    ioc_class = F.element_at(
        F.array(*[F.lit(c) for c in classes]), (F.col("doc_id") % 7 + 1).cast("int")
    )
    mapping = spark.createDataFrame(
        [(k, v) for k, v in IOC_TO_ENTITY_TYPE.items()], ["ioc_class", "node_type"]
    )
    mentions = d.select("doc_id", ioc_class.alias("ioc_class"))
    return mentions.join(F.broadcast(mapping), "ioc_class").select(
        "doc_id", "ioc_class", "node_type"
    )


def q_kg_cve_mentions(spark, sf_dir):
    docs = _cti_docs(spark, sf_dir)
    return (
        docs.select(
            F.explode(
                F.regexp_extract_all("doc_text", F.lit(_CVE_RX), 0)
            ).alias("value")
        )
        .groupBy("value")
        .agg(F.count("*").alias("n_mentions"))
    )


def q_ioc_first_last_seen(spark, sf_dir):
    """IOC sighting window (MISP/OpenCTI first_seen/last_seen analog):
    per CVE value over the deterministic CTI corpus, the earliest and
    latest sighting date (o_orderdate as the document timestamp) and
    the distinct-document count. Pure Catalyst: regexp explode →
    groupBy(min, max, count distinct) — one keyed shuffle."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    docs = _cti_docs(spark, sf_dir).join(
        o.select(
            F.col("o_orderkey").cast("string").alias("conv_id"), "o_orderdate"
        ),
        "conv_id",
    )
    return (
        docs.select(
            "conv_id",
            "o_orderdate",
            F.explode(
                F.regexp_extract_all("doc_text", F.lit(_CVE_RX), 0)
            ).alias("value"),
        )
        .groupBy("value")
        .agg(
            F.min("o_orderdate").alias("first_seen"),
            F.max("o_orderdate").alias("last_seen"),
            F.countDistinct("conv_id").alias("n_docs"),
        )
    )


def q_kg_ipv4_mentions(spark, sf_dir):
    docs = _cti_docs(spark, sf_dir)
    return (
        docs.select(
            F.col("conv_id").alias("doc_id"),
            F.explode(
                F.regexp_extract_all("doc_text", F.lit(_IPV4_SIMPLE), 0)
            ).alias("value"),
        )
        .distinct()
    )


def q_kg_triples_from_kernel(spark, sf_dir):
    """Full extraction kernel over constructed text; the oracle predicts
    the triple set analytically (strongest end-to-end check)."""
    records = extract_graph_records(_cti_docs(spark, sf_dir))
    return (
        records.filter(F.col("kind") == "edge")
        .select(
            F.col("src_id").alias("subj"),
            F.col("rel_type").alias("pred"),
            F.col("dst_id").alias("obj"),
        )
        .distinct()
    )


def q_kg_nodes_from_kernel(spark, sf_dir):
    """Kernel node typing/canonicalization over constructed text; oracle
    predicts (label, id) rows analytically."""
    records = extract_graph_records(_cti_docs(spark, sf_dir))
    return (
        records.filter(F.col("kind") == "node")
        .select("node_label", "node_id")
        .distinct()
    )


def q_kg_llm_mock_triples(spark, sf_dir):
    """Full LLM-extractor plumbing (chunk dispatch → batch backend → JSON
    repair → stored records) with the deterministic mock backend over the
    constructed CTI corpus; every 3rd payload is truncated so the repair
    path runs inside the gate. Constructed docs are single-chunk, so the
    expected triples equal the kernel oracle's analytic prediction."""
    from threat_intelligence_knowledge_graph_spark.operators.extractors import (
        LlmExtractor,
        MockKernelBackend,
    )

    docs = _cti_docs(spark, sf_dir)  # (conv_id, doc_text), single-chunk texts
    ex = LlmExtractor("default", backend=MockKernelBackend(corrupt_every=3))
    records = ex.extract(docs)
    return (
        records.filter(F.col("kind") == "edge")
        .select(
            F.col("src_id").alias("subj"),
            F.col("rel_type").alias("pred"),
            F.col("dst_id").alias("obj"),
        )
        .distinct()
    )


def q_kg_edge_dedup(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.select(
            F.concat(F.lit("part_"), F.col("l_partkey").cast("string")).alias("subj"),
            F.lit("SUPPLIED_BY").alias("pred"),
            F.concat(F.lit("supp_"), F.col("l_suppkey").cast("string")).alias("obj"),
        )
        .distinct()
    )


def q_kg_endpoint_semijoin(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nodes = cust.select(
        F.concat(F.lit("c_"), F.col("c_custkey").cast("string")).alias("node_id")
    )
    edges = o.select(
        F.concat(F.lit("c_"), F.col("o_custkey").cast("string")).alias("src_id"),
        F.concat(F.lit("c_"), (F.col("o_orderkey") % 3000).cast("string")).alias(
            "dst_id"
        ),
    ).distinct()
    return (
        edges.join(nodes, edges.src_id == nodes.node_id, "left_semi")
        .join(nodes, edges.dst_id == nodes.node_id, "left_semi")
    )


def _constructed_triples(spark, sf_dir):
    """Deterministic triple table from orders: customer -PLACED-> order
    -HANDLED-> priority-class node (two typed hops per order row)."""
    o = _t(spark, sf_dir, "orders")
    placed = o.select(
        F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("subj"),
        F.lit("PLACED").alias("pred"),
        F.concat(F.lit("o"), F.col("o_orderkey").cast("string")).alias("obj"),
    )
    handled = o.select(
        F.concat(F.lit("o"), F.col("o_orderkey").cast("string")).alias("subj"),
        F.lit("HANDLED").alias("pred"),
        F.concat(F.lit("p_"), F.col("o_orderpriority")).alias("obj"),
    )
    return placed.unionByName(handled)


_CONSTRUCTED_TRIPLES_SQL = """
    SELECT 'c' || cast(o_custkey AS varchar) AS subj,
           'PLACED' AS pred,
           'o' || cast(o_orderkey AS varchar) AS obj
    FROM orders
    UNION ALL
    SELECT 'o' || cast(o_orderkey AS varchar) AS subj,
           'HANDLED' AS pred,
           'p_' || o_orderpriority AS obj
    FROM orders
"""


def q_kg_degrees(spark, sf_dir):
    """The graph-query interface (SURVEY §2 op 30) against a constructed
    triple view — per-node in/out/total degree via the real `degrees`
    function the Cypher-degree pattern maps to."""
    from threat_intelligence_knowledge_graph_spark.plans.graph_queries import degrees

    _constructed_triples(spark, sf_dir).createOrReplaceTempView("triples")
    return degrees(spark)


def q_kg_two_hop(spark, sf_dir):
    """Cypher `(a)-[PLACED]->(b)-[HANDLED]->(c)` via the real `two_hop`
    self-join over the constructed triple view."""
    from threat_intelligence_knowledge_graph_spark.plans.graph_queries import two_hop

    _constructed_triples(spark, sf_dir).createOrReplaceTempView("triples")
    return two_hop(spark, "PLACED", "HANDLED")


def q_kg_metrics_rollup(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    return e.groupBy(F.col("event_type").alias("stage")).agg(
        F.count("*").alias("n_rows"),
        F.floor(F.sum("value")).cast("long").alias("total_value"),
    )


def q_tpch_q1(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").cast("long").alias("sum_qty"),
            F.floor(F.sum("l_extendedprice")).cast("long").alias("sum_base_price"),
            F.floor(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).cast("long").alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
    )


def q_join_customer_orders(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            F.floor(F.sum("o_totalprice")).cast("long").alias("revenue"),
        )
    )


def q_events_user_windows(spark, sf_dir):
    from pyspark.sql.window import Window

    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        "user_id",
        F.row_number().over(w).alias("rn"),
        F.lag("event_type").over(w).alias("prev_type"),
    )


def q_events_sessionize(spark, sf_dir):
    from pyspark.sql.window import Window

    # One unix_micros conversion per row up front; both windows and the
    # final agg then work on the bigint (ordering by tsu ≡ ordering by
    # ts — the conversion is monotone — so the shared partition-local
    # sort, ONE Exchange + ONE Sort, is unchanged; re-pinned r5).
    e = _t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("tsu"),
    )
    w = Window.partitionBy("user_id").orderBy("tsu", "event_id")
    gap = F.col("tsu") - F.lag("tsu").over(w)
    flagged = e.select(
        "user_id",
        "event_id",
        "tsu",
        F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000), 1)
        .otherwise(0)
        .alias("new_session"),
    )
    w2 = Window.partitionBy("user_id").orderBy("tsu", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sessions = flagged.select(
        "user_id", "event_id", "tsu", F.sum("new_session").over(w2).alias("session_id")
    )
    return sessions.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        ((F.max("tsu") - F.min("tsu")) / F.lit(1_000_000))
        .cast("long")
        .alias("duration_sec"),
    )


def q_top_parts_by_revenue(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    rev = (
        li.groupBy("l_partkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )
    return (
        rev.join(F.broadcast(p), rev.l_partkey == p.p_partkey)
        .select(F.col("p_partkey").alias("partkey"), F.col("p_name").alias("part_name"), "revenue")
        .orderBy(F.col("revenue").desc(), F.col("partkey"))
        .limit(10)
    )


def q_html_to_text(spark, sf_dir):
    """URL/report ingestion path (reference main.py:136-142): extract
    readable text from constructed HTML — article-region pick, script
    strip, entity decode — as a pure Catalyst chain; the oracle runs the
    identical pinned spec in DuckDB SQL."""
    from threat_intelligence_knowledge_graph_spark.sources.html import html_to_text

    o = _t(spark, sf_dir, "orders")
    k = F.col("o_orderkey").cast("string")
    html = F.concat(
        F.lit("<html><head><style>body{color:red}</style></head><body>"),
        F.lit("<script>var x = 1 < 2;</script>"),
        F.lit("<article><h1>Report "), k, F.lit("</h1>"),
        F.lit("<p>Priority &amp; status: "), F.col("o_orderpriority"),
        F.lit("</p><!-- hidden --><p>Customer &lt;"),
        F.col("o_custkey").cast("string"),
        F.lit("&gt;</p></article>"),
        F.lit("<footer>ignored? no — body fallback only</footer></body></html>"),
    )
    return o.select(
        F.col("o_orderkey").alias("doc_id"),
        html_to_text(html).alias("text"),
    )


def q_multimodal_decode(spark, sf_dir):
    """Multimodal binary-column plumbing end-to-end: pack a 16-byte-header
    payload per orderkey (arithmetic dims), ship the binary column through
    Arrow, decode with the real mapInPandas kernel, emit typed metadata.
    The oracle recomputes the header fields analytically."""
    from threat_intelligence_knowledge_graph_spark.operators.multimodal import (
        decode_assets,
        pack_assets,
    )

    ids = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("asset_id")
    )
    decoded = decode_assets(pack_assets(ids), fake=True)
    return decoded.select("asset_id", "kind", "width", "height", "n_frames")


def q_skew_hot_entities(spark, sf_dir):
    """Salted two-phase rollup (value-independent salt) over the
    constructed triple table — must equal a plain GROUP BY count."""
    from threat_intelligence_knowledge_graph_spark.operators.skew import (
        hot_entity_counts,
    )

    return hot_entity_counts(_constructed_triples(spark, sf_dir), n_salts=32)


def q_pack_documents(spark, sf_dir):
    """Sequence packing for pretraining batches: documents → fixed-token
    packs via the deterministic bin-by-prefix-sum operator (one window
    cumsum — exactly SQL-reproducible, unlike greedy first-fit)."""
    from threat_intelligence_knowledge_graph_spark.operators.packing import (
        pack_documents,
    )

    d = token_counts(_t(spark, sf_dir, "documents")).select(
        "doc_id",
        F.col("ws_tokens").cast("long").alias("n_tokens"),
        (F.col("doc_id") % 4).cast("long").alias("shard"),
    )
    # Sharded packing (the 100 TB shape): the cumsum window partitions by
    # shard so no single task sees the whole corpus; (shard, pack_id) is
    # the global pack key.
    return pack_documents(d, token_budget=500, shard_col="shard")


def q_train_val_split(spark, sf_dir):
    """Deterministic train/val assignment by engine-portable md5 hash —
    reproducible across engines/runs/partitionings, no RNG."""
    from threat_intelligence_knowledge_graph_spark.operators.packing import (
        split_by_hash,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id")
    return split_by_hash(d, "doc_id", train_frac=0.9)


def q_ngram_decontaminate(spark, sf_dir):
    """Benchmark decontamination: (doc, eval-item) pairs sharing a word
    3-gram. The eval set is synthesized from the corpus itself (every
    25th doc's first 12 tokens) so the oracle needs no external data and
    hits are guaranteed non-vacuous (each eval item at least matches its
    own source doc)."""
    from threat_intelligence_knowledge_graph_spark.operators.decontaminate import (
        ngram_contamination,
    )

    d = _t(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    ev = d.filter(F.col("doc_id") % 25 == 0).select(
        F.col("doc_id").alias("eval_id"),
        F.array_join(F.slice(toks, 1, 12), " ").alias("text"),
    )
    return ngram_contamination(d, ev, n=3).select(
        "doc_id",
        "eval_id",
        F.col("shared_ngrams").cast("long").alias("shared_ngrams"),
    )


def q_sample_stratified(spark, sf_dir):
    """Deterministic stratified sampling by engine-portable md5 bucket —
    per-stratum rates, partition-independent, monotone in the rate."""
    from threat_intelligence_knowledge_graph_spark.operators.packing import (
        sample_by_hash,
    )

    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    return sample_by_hash(
        o, "o_orderkey", "o_orderstatus", {"O": 0.1, "F": 0.05, "P": 0.5}
    )


def _planted_curation_docs(spark, sf_dir):
    """Curation-pipeline corpus: the planted near-dup families (every
    7th orderkey — k % 3 ≠ 0 families carry a jaccard-1.0 pair) plus
    four crafted extras, one per upstream filter stage:

      -301  punct/caps junk       → dropped by the quality filter
      -302  Spanish stopword text → dropped by the language filter
      -200  exact copy of -201    → dropped by exact dedup (min id kept)
      -201  standalone English    → survives everything
    """
    base = _planted_near_dup_docs(spark, sf_dir, every=7)
    extras = spark.createDataFrame(
        [
            (-301, "A. B. C."),
            (-302, "el la de que y un los se no por el la de que y un los se no por"),
            (-201, "the and of to in it is was for on the and of to in it is was for on"),
            (-200, "the and of to in it is was for on the and of to in it is was for on"),
        ],
        "doc_id long, text string",
    )
    return base.select(F.col("doc_id").cast("long"), "text").unionByName(extras)


def q_curate_corpus(spark, sf_dir):
    """The COMPOSED curation pipeline (plans/curation.py) end-to-end:
    quality → language → exact dedup → minhash near-dedup →
    decontamination → split → token counts → packing, over a corpus
    planted so every stage bites and every stage's survivor set is
    analytic (the minhash_near_dup_docs soundness argument extends to
    the composition: same-cycle families are jaccard-1.0 clusters, so
    the approximate near-dedup provably equals the exact answer).

    Eval items for decontamination are the first 12 tokens of the j=0
    doc of every k % 5 == 0 family — an 8-gram window of a wd-cycle
    always contains 'wd<k>', so exactly those source docs (and no
    we-cycle survivor) are contaminated."""
    from threat_intelligence_knowledge_graph_spark.plans.curation import (
        curate_documents,
    )

    docs = _planted_curation_docs(spark, sf_dir)
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    ev = docs.filter((F.col("doc_id") >= 0) & (F.col("doc_id") % 10 == 0)).select(
        F.col("doc_id").alias("eval_id"),
        F.array_join(F.slice(toks, 1, 12), " ").alias("text"),
    )
    curated, _metrics = curate_documents(
        docs,
        ev,
        min_quality=0.3,
        languages=("en",),
        near_dup_threshold=0.8,
        decontaminate_n=8,
        train_frac=0.9,
        token_budget=64,
    )
    return curated.select(
        "doc_id",
        F.round("quality", 6).alias("quality"),
        "lang_pred",
        "split",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("pack_id").cast("long").alias("pack_id"),
    )


def q_curate_increment(spark, sf_dir):
    """Steady-state incremental curation (plans/curation.py::
    curate_increment) — TWO increments against a throwaway warehouse,
    every admission decision analytic:

    Batch 1 (id 10k per every-7th orderkey k): the 4-word cycle doc
    'wa<k> wb<k> wc<k> wd<k>' ×5. Eval items are the first 12 tokens of
    the k%5==0 docs (a 12-word window of a period-4 cycle contains all
    four 8-gram phases, so exactly those docs are contaminated — the
    q_curate_corpus argument); everything else is accepted.

    Batch 2 (id 10k + OFFSET where OFFSET = 10·max(orderkey)+10,
    computed from the data so the monotone-across-batches invariant
    holds at ANY scale factor — a fixed 10^8 offset would interleave
    below batch-1 ids at sf10+), one doc per k by k%4: 0 → exact copy of batch-1's doc (exact_dup — via the SHADOW
    hash set when k%5==0, i.e. when the original was itself rejected as
    contaminated); 1 → same cycle ×7 (jaccard-1.0 near_dup, via the
    band index incl. shadow rows); 2 → fresh 'xa<k>…' cycle (accepted —
    disjoint word shingles, eval-clean); 3 → Spanish stopword text
    (language).

    Output: (batch, doc_id, status) for every input doc; the DuckDB
    oracle states the same decisions as CASE arithmetic on the keys."""
    import shutil
    import tempfile

    from threat_intelligence_knowledge_graph_spark.plans.curation import (
        curate_increment,
    )
    from threat_intelligence_knowledge_graph_spark.sources.tableio import (
        LocalTableCatalog,
    )

    ks = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 7 == 0)
        .select(F.col("o_orderkey").alias("k"))
    )
    s = F.col("k").cast("string")
    cycle = F.concat_ws(
        " ",
        F.concat(F.lit("wa"), s), F.concat(F.lit("wb"), s),
        F.concat(F.lit("wc"), s), F.concat(F.lit("wd"), s),
    )
    xcycle = F.concat_ws(
        " ",
        F.concat(F.lit("xa"), s), F.concat(F.lit("xb"), s),
        F.concat(F.lit("xc"), s), F.concat(F.lit("xd"), s),
    )
    rep = lambda c, n: F.array_join(F.array_repeat(c, n), " ")  # noqa: E731
    b1 = ks.select((F.col("k") * 10).alias("doc_id"), rep(cycle, 5).alias("text"))
    ev = ks.filter(F.col("k") % 5 == 0).select(
        F.col("k").alias("eval_id"), rep(cycle, 3).alias("text")
    )
    spanish = F.concat(
        F.lit("el la de que y un los se no por el la de que y un los se no por s"),
        s,
    )
    b2_text = (
        F.when(F.col("k") % 4 == 0, rep(cycle, 5))
        .when(F.col("k") % 4 == 1, rep(cycle, 7))
        .when(F.col("k") % 4 == 2, rep(xcycle, 5))
        .otherwise(spanish)
    )
    # bounded 1-row collect (the IVF-centroid precedent) to derive the
    # scale-proof monotone offset from the data itself
    offset = 10 * ks.agg(F.max("k")).first()[0] + 10
    b2 = ks.select(
        (F.col("k") * 10 + F.lit(offset)).alias("doc_id"),
        b2_text.alias("text"),
    )

    wh = tempfile.mkdtemp(prefix="tikg-contract-incr-")
    try:
        catalog = LocalTableCatalog(wh)
        acc1, rej1 = curate_increment(
            spark, b1, catalog, ev, run_id="b1", decontaminate_n=8
        )
        acc2, rej2 = curate_increment(
            spark, b2, catalog, ev, run_id="b2", decontaminate_n=8
        )
        tag = lambda df, b, st: df.select(  # noqa: E731
            F.lit(b).alias("batch"),
            F.col("doc_id").cast("long").alias("doc_id"),
            st.alias("status"),
        )
        out = (
            tag(acc1, 1, F.lit("accepted"))
            .unionByName(tag(rej1, 1, F.col("reason")))
            .unionByName(tag(acc2, 2, F.lit("accepted")))
            .unionByName(tag(rej2, 2, F.col("reason")))
        )
        # materialize before the warehouse dir disappears
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(wh, ignore_errors=True)


def q_sample_mixture(spark, sf_dir):
    """Exact-proportion corpus mixing (pretraining mixture weights):
    the largest md5-deterministic sample with per-source composition
    O:F:P = 5:3:2. P is the binding (smallest/share) source and is taken
    whole; O and F down-sample to match — the oracle recomputes the
    water level T and thresholds in the identical double arithmetic."""
    from threat_intelligence_knowledge_graph_spark.operators.packing import (
        mixture_sample,
    )

    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    return mixture_sample(
        o, "o_orderkey", "o_orderstatus", {"O": 0.5, "F": 0.3, "P": 0.2}
    )


def q_split_oversized_docs(spark, sf_dir):
    """Oversized-document splitting ahead of packing: docs over 40
    whitespace tokens become contiguous 40-token pieces (piece_idx
    preserves order)."""
    from threat_intelligence_knowledge_graph_spark.operators.packing import (
        split_oversized,
    )

    return split_oversized(_t(spark, sf_dir, "documents"), 40).select(
        "doc_id",
        F.col("piece_idx").cast("int").alias("piece_idx"),
        "text",
        F.col("n_tokens").cast("long").alias("n_tokens"),
    )


def q_text_scrub_pii(spark, sf_dir):
    """PII redaction (emails/phones/SSNs/cards → typed placeholders) —
    a pure regexp_replace chain whose pattern strings are shared
    verbatim with the RE2 oracle (PII_PATTERNS is written lookaround-
    free for exactly this portability)."""
    from threat_intelligence_knowledge_graph_spark.operators.text_quality import (
        scrub_pii,
    )

    return scrub_pii(_t(spark, sf_dir, "documents"))


def q_text_repetition_ratio(spark, sf_dir):
    """Gopher/RefinedWeb-style repetition signal: 1 − distinct/total
    8-char shingles, pure Catalyst."""
    from threat_intelligence_knowledge_graph_spark.operators.text_quality import (
        repetition_ratio,
    )

    return repetition_ratio(_t(spark, sf_dir, "documents")).select(
        "doc_id", F.round("rep_ratio", 6).alias("rep_ratio")
    )


def q_graph_connected_components(spark, sf_dir):
    """Connected components (min-id labeling) over a planted chain
    forest: every 11th orderkey contributes a 5-node path (diameter 4 —
    several propagation rounds, not a trivial star). The DuckDB oracle
    is an INDEPENDENT computation: a recursive-CTE transitive closure
    with min-reachable-id labeling."""
    from threat_intelligence_knowledge_graph_spark.operators.graph_algos import (
        connected_components,
    )

    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 11 == 0)
    base = o.select(
        (F.col("o_orderkey") * 5).alias("k5"),
        F.explode(F.sequence(F.lit(0), F.lit(3))).alias("i"),
    )
    edges = base.select(
        (F.col("k5") + F.col("i")).alias("a"),
        (F.col("k5") + F.col("i") + 1).alias("b"),
    )
    return connected_components(edges).select(
        F.col("id").cast("long").alias("id"),
        F.col("component").cast("long").alias("component"),
    )


def _triangle_gadget_edges(spark, sf_dir):
    """Planted 3-clique + pendant-tail gadgets (one per 13th orderkey):
    edges (3k,3k+1), (3k+1,3k+2), (3k,3k+2), (3k+2,3k+3) as (src, dst)
    — shared by the triangle-count and clustering-coefficient entries."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 13 == 0)
    k3 = (F.col("o_orderkey") * 3).alias("k3")
    return (
        o.select(k3, F.explode(F.array(
            F.struct(F.lit(0).alias("i"), F.lit(1).alias("j")),
            F.struct(F.lit(1).alias("i"), F.lit(2).alias("j")),
            F.struct(F.lit(0).alias("i"), F.lit(2).alias("j")),
            F.struct(F.lit(2).alias("i"), F.lit(3).alias("j")),
        )).alias("p"))
        .select(
            (F.col("k3") + F.col("p.i")).alias("src"),
            (F.col("k3") + F.col("p.j")).alias("dst"),
        )
    )


def q_graph_triangle_count(spark, sf_dir):
    """Per-node triangle membership (GDS triangleCount shape): every
    13th orderkey plants a 3-clique plus a pendant tail node (1 triangle
    per clique corner, 0 for the tail). Oracle: an independent canonical
    ordered-edge three-way join in SQL."""
    from threat_intelligence_knowledge_graph_spark.operators.graph_algos import (
        triangle_count,
    )

    e = _triangle_gadget_edges(spark, sf_dir)
    return triangle_count(e).select(
        F.col("id").cast("long").alias("id"),
        F.col("triangles").cast("long").alias("triangles"),
    )


def q_graph_node_similarity(spark, sf_dir):
    """Neighbor-set Jaccard between parts sharing suppliers (GDS
    nodeSimilarity shape) over the lineitem part→supplier bipartite
    graph (every 20th part). Fully SQL-expressible: intersection from
    the shared-neighbor self-join, union from degree arithmetic."""
    from threat_intelligence_knowledge_graph_spark.operators.graph_algos import (
        node_similarity,
    )

    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_partkey") % 20 == 0)
    edges = li.select(
        F.col("l_partkey").alias("src"), F.col("l_suppkey").alias("dst")
    )
    return node_similarity(edges, threshold=0.2).select(
        F.col("a").cast("long").alias("a"),
        F.col("b").cast("long").alias("b"),
        F.round("jaccard", 6).alias("jaccard"),
    )


def q_graph_link_prediction(spark, sf_dir):
    """Shared-neighbor link prediction (GDS alpha linkprediction.*
    family: commonNeighbors / adamicAdar / resourceAllocation /
    preferentialAttachment, all four as columns) over planted per-order
    star gadgets: every 23rd orderkey k gets nodes o{k}_0..o{k}_4 with
    hub edges 0-{1,2,3,4} plus leaf edge 1-2. The open wedges through
    the hub are the predicted pairs; (1,2) is adjacent and must be
    anti-joined away. Fully SQL-expressible: the same through-node
    self-join + degree arithmetic as the node-similarity oracle."""
    from threat_intelligence_knowledge_graph_spark.operators.graph_algos import (
        link_prediction,
    )

    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 23 == 0)
    node = lambda i: F.concat(  # noqa: E731
        F.lit("o"), F.col("o_orderkey").cast("string"), F.lit(f"_{i}")
    )
    pairs = [(0, 1), (0, 2), (0, 3), (0, 4), (1, 2)]
    edges = o.select(
        F.explode(
            F.array(
                *[
                    F.struct(node(a).alias("src"), node(b).alias("dst"))
                    for a, b in pairs
                ]
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    return link_prediction(edges).select(
        "a",
        "b",
        "common_neighbors",
        F.round("adamic_adar", 6).alias("adamic_adar"),
        F.round("resource_allocation", 6).alias("resource_allocation"),
        "preferential_attachment",
    )


def q_graph_label_propagation(spark, sf_dir):
    """Deterministic synchronous LPA (4 iterations, min-label ties)
    over planted 4-cliques (every 17th orderkey → nodes 4k..4k+3). With
    init labels = ids and a fixed iteration count the update is a pure
    recurrence; the oracle unrolls the identical join + count + argmax
    per iteration."""
    from threat_intelligence_knowledge_graph_spark.operators.graph_algos import (
        label_propagation,
    )

    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 17 == 0)
    k4 = (F.col("o_orderkey") * 4).alias("k4")
    pairs = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
    e = (
        o.select(
            k4,
            F.explode(
                F.array(
                    *[
                        F.struct(F.lit(a).alias("a"), F.lit(b).alias("b"))
                        for a, b in pairs
                    ]
                )
            ).alias("p"),
        )
        .select(
            (F.col("k4") + F.col("p.a")).alias("src"),
            (F.col("k4") + F.col("p.b")).alias("dst"),
        )
    )
    return label_propagation(e, iterations=4).select(
        F.col("id").cast("long").alias("id"),
        F.col("label").cast("long").alias("label"),
    )


def q_graph_bfs_distances(spark, sf_dir):
    """Directed BFS hop distances from n0 over the planted nation graph
    (the PageRank topology: 25-cycle over n-nodes + nation→region sink
    edges). With deterministic topology the min-hop distances are a
    fixed point the recursive-CTE oracle reaches by enumerating walks
    (UNION-dedup bounds the recursion on the cycle)."""
    from threat_intelligence_knowledge_graph_spark.operators.graph_algos import (
        bfs_distances,
    )

    nat = _t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    nkey = F.concat(F.lit("n"), F.col("n_nationkey").cast("string"))
    cyc = nat.select(
        nkey.alias("src"),
        F.concat(
            F.lit("n"), ((F.col("n_nationkey") + 1) % 25).cast("string")
        ).alias("dst"),
    )
    reg = nat.select(
        nkey.alias("src"),
        F.concat(F.lit("r"), F.col("n_regionkey").cast("string")).alias("dst"),
    )
    edges = cyc.unionByName(reg)
    sources = spark.createDataFrame([("n0",)], ["id"])
    return bfs_distances(edges, sources, max_hops=30)


def q_graph_anf(spark, sf_dir):
    """HyperANF (Boldi/Rosa/Vigna) 2-hop ball-size estimates for every
    node of the planted nation graph (undirected 25-cycle +
    nation–region edges), p=4 → 16 registers per node. The whole
    recurrence — md5 register routing, integer-comparison leading-1
    ranks, registerwise-max merges over neighbors, and the
    scaled-integer harmonic sum — is exact integer arithmetic, so the
    row-based DuckDB unroll lands on the identical per-node witness
    (`s_scaled`); the one float op is the final division, identical in
    both engines (raw-HLL estimate, no small-range correction, per
    operators/sketches.py)."""
    from threat_intelligence_knowledge_graph_spark.operators.graph_algos import (
        anf_ball_sizes,
    )

    nat = _t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    nkey = F.concat(F.lit("n"), F.col("n_nationkey").cast("string"))
    cyc = nat.select(
        nkey.alias("src"),
        F.concat(
            F.lit("n"), ((F.col("n_nationkey") + 1) % 25).cast("string")
        ).alias("dst"),
    )
    reg = nat.select(
        nkey.alias("src"),
        F.concat(F.lit("r"), F.col("n_regionkey").cast("string")).alias("dst"),
    )
    return anf_ball_sizes(cyc.unionByName(reg), hops=2, p=4)


def q_table_checks(spark, sf_dir):
    """Declarative data-quality suite over orders — 5 constraints in ONE
    aggregation pass (deequ-style expectations for pipeline outputs)."""
    from threat_intelligence_knowledge_graph_spark.operators.quality_checks import (
        in_range,
        in_set,
        matches,
        not_null,
        run_checks,
        unique,
    )

    o = _t(spark, sf_dir, "orders")
    return run_checks(
        o,
        [
            not_null("o_orderkey"),
            unique("o_orderkey"),
            in_set("o_orderstatus", ["O", "F", "P"]),
            in_range("o_totalprice", 0.0, 1e9),
            matches("o_orderpriority", r"^[1-5]-"),
        ],
    )


def q_graph_pagerank(spark, sf_dir):
    """PageRank (3 synchronous power steps, d=0.85) over a planted
    30-node graph derived from `nation`: a 25-cycle over n-nodes plus
    nation→region edges (the 5 r-nodes are dangling sinks, exercising
    dangling-mass redistribution). With a fixed iteration count the
    update is a deterministic float recurrence, so the DuckDB oracle
    unrolls the identical arithmetic; both sides round to 9 decimals
    (summation-order noise is ~1e-17)."""
    from threat_intelligence_knowledge_graph_spark.operators.pagerank import (
        pagerank,
    )

    nat = _t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    nkey = F.concat(F.lit("n"), F.col("n_nationkey").cast("string"))
    cyc = nat.select(
        nkey.alias("src_id"),
        F.concat(
            F.lit("n"), ((F.col("n_nationkey") + 1) % 25).cast("string")
        ).alias("dst_id"),
    )
    reg = nat.select(
        nkey.alias("src_id"),
        F.concat(F.lit("r"), F.col("n_regionkey").cast("string")).alias("dst_id"),
    )
    ranks = pagerank(cyc.union(reg), iterations=3, damping=0.85)
    return ranks.select("id", F.round("rank", 9).alias("rank"))


def q_graph_pagerank_weighted(spark, sf_dir):
    """Weighted PageRank (GDS relationshipWeightProperty analog, 3
    steps, d=0.85) over the same planted nation graph as
    q_graph_pagerank, with integer edge weights (cycle edge u→v weighs
    1 + (n_nationkey % 3); nation→region edges weigh 2). Rank flows in
    proportion to weight / out-weight-sum; the DuckDB oracle unrolls
    the identical float recurrence (both sides round to 9 decimals)."""
    from threat_intelligence_knowledge_graph_spark.operators.pagerank import (
        pagerank,
    )

    nat = _t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    nkey = F.concat(F.lit("n"), F.col("n_nationkey").cast("string"))
    cyc = nat.select(
        nkey.alias("src_id"),
        F.concat(
            F.lit("n"), ((F.col("n_nationkey") + 1) % 25).cast("string")
        ).alias("dst_id"),
        (F.lit(1) + F.col("n_nationkey") % 3).cast("double").alias("wt"),
    )
    reg = nat.select(
        nkey.alias("src_id"),
        F.concat(F.lit("r"), F.col("n_regionkey").cast("string")).alias("dst_id"),
        F.lit(2.0).alias("wt"),
    )
    ranks = pagerank(
        cyc.union(reg), iterations=3, damping=0.85, weight="wt"
    )
    return ranks.select("id", F.round("rank", 9).alias("rank"))


def q_graph_pagerank_personalized(spark, sf_dir):
    """Personalized PageRank (GDS sourceNodes analog, 3 steps, d=0.85)
    over the same planted nation graph as q_graph_pagerank, teleporting
    to seeds {n0, n12, r2} (r2 is a dangling sink — dangling mass
    returns to the seeds, not uniformly). rank⁰ = t; rank'(v) =
    (1-d)·t(v) + d·(Σ contribs + dangling·t(v)). The DuckDB oracle
    unrolls the identical float recurrence with the seeded teleport
    vector; both sides round to 9 decimals."""
    from threat_intelligence_knowledge_graph_spark.operators.pagerank import (
        pagerank,
    )

    nat = _t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    nkey = F.concat(F.lit("n"), F.col("n_nationkey").cast("string"))
    cyc = nat.select(
        nkey.alias("src_id"),
        F.concat(
            F.lit("n"), ((F.col("n_nationkey") + 1) % 25).cast("string")
        ).alias("dst_id"),
    )
    reg = nat.select(
        nkey.alias("src_id"),
        F.concat(F.lit("r"), F.col("n_regionkey").cast("string")).alias("dst_id"),
    )
    ranks = pagerank(
        cyc.union(reg), iterations=3, damping=0.85, seeds=["n0", "n12", "r2"]
    )
    return ranks.select("id", F.round("rank", 9).alias("rank"))


def q_graph_pagerank_delta(spark, sf_dir):
    """Centrality shift between two planted edge snapshots of the
    nation graph (operators/pagerank.py::pagerank_delta — the "rising
    infrastructure" analyst primitive): window BEFORE is the bare
    25-cycle n→(n+1)%25 (no dangling, no r-nodes); window AFTER is the
    shifted cycle n→(n+2)%25 plus nation→region edges (r-nodes appear,
    dangling). Each window is 3 synchronous power steps at d=0.85;
    delta = rank_after − rank_before on the union universe with absent-
    window rank 0.0 (the r-nodes exist only after → maximally rising).
    The DuckDB oracle unrolls BOTH float recurrences (suffixes a/b) and
    full-outer-joins them; both sides round to 9 decimals."""
    from threat_intelligence_knowledge_graph_spark.operators.pagerank import (
        pagerank_delta,
    )

    nat = _t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    nkey = F.concat(F.lit("n"), F.col("n_nationkey").cast("string"))
    before = nat.select(
        nkey.alias("src_id"),
        F.concat(
            F.lit("n"), ((F.col("n_nationkey") + 1) % 25).cast("string")
        ).alias("dst_id"),
    )
    after = nat.select(
        nkey.alias("src_id"),
        F.concat(
            F.lit("n"), ((F.col("n_nationkey") + 2) % 25).cast("string")
        ).alias("dst_id"),
    ).union(
        nat.select(
            nkey.alias("src_id"),
            F.concat(F.lit("r"), F.col("n_regionkey").cast("string")).alias(
                "dst_id"
            ),
        )
    )
    d = pagerank_delta(before, after, iterations=3, damping=0.85)
    return d.select(
        "id",
        F.round("rank_before", 9).alias("rank_before"),
        F.round("rank_after", 9).alias("rank_after"),
        F.round("delta", 9).alias("delta"),
    )


def _cypher_graph(spark, sf_dir):
    """Planted node/edge store for the Cypher-lite entries: every 31st
    orderkey k gets Malware m{k} (props name=mal{k}, size=k%10), two
    Domains a{k}/b{k} (.evil.net names), an Ipv4, and edges
    m→COMMUNICATES_WITH→both domains + a{k}→RESOLVES_TO→ip{k}."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 31 == 0)
    k = F.col("o_orderkey").cast("string")
    size = (F.col("o_orderkey") % 10).cast("string")

    def node(label, nid, name, with_size=False):
        props = [F.lit("name"), name]
        if with_size:
            props += [F.lit("size"), size]
        return o.select(
            F.lit(label).alias("node_label"),
            nid.alias("node_id"),
            F.create_map(*props).alias("properties"),
        )

    m_id = F.concat(F.lit("m"), k)
    da_id = F.concat(F.lit("da"), k)
    db_id = F.concat(F.lit("db"), k)
    ip_id = F.concat(F.lit("ip"), k)
    nodes = (
        node("Malware", m_id, F.concat(F.lit("mal"), k), with_size=True)
        .unionByName(node("Domain", da_id, F.concat(F.lit("a"), k, F.lit(".evil.net"))))
        .unionByName(node("Domain", db_id, F.concat(F.lit("b"), k, F.lit(".evil.net"))))
        .unionByName(node("Ipv4", ip_id, F.lit("10.0.0.1")))
    )

    def edge(sl, sid, rt, dl, did):
        return o.select(
            F.lit(sl).alias("src_label"),
            sid.alias("src_id"),
            F.lit(rt).alias("rel_type"),
            F.lit(dl).alias("dst_label"),
            did.alias("dst_id"),
        )

    edges = (
        edge("Malware", m_id, "COMMUNICATES_WITH", "Domain", da_id)
        .unionByName(edge("Malware", m_id, "COMMUNICATES_WITH", "Domain", db_id))
        .unionByName(edge("Domain", da_id, "RESOLVES_TO", "Ipv4", ip_id))
    )
    return nodes, edges


def q_cypher_match_filter(spark, sf_dir):
    """Cypher-lite translation end-to-end: label + property-map scans,
    a typed directed hop, numeric weak-typed WHERE and STARTS WITH —
    the ad-hoc MATCH surface the reference exposes as a raw Neo4j
    pass-through (reference neo4j_store.py:175-208). The oracle
    replays the planted-graph semantics directly in SQL."""
    from threat_intelligence_knowledge_graph_spark.plans.cypher_lite import (
        cypher_query,
    )

    nodes, edges = _cypher_graph(spark, sf_dir)
    return cypher_query(
        spark,
        "MATCH (m:Malware)-[r:COMMUNICATES_WITH]->(d:Domain) "
        "WHERE m.size > 5 AND d.name STARTS WITH 'a' "
        "RETURN m AS malware, d.name AS domain",
        nodes=nodes,
        edges=edges,
    )


def q_cypher_two_hop_count(spark, sf_dir):
    """Cypher-lite two-hop chain + implicit aggregation grouping
    (RETURN m.size, count(*)) over the planted store — Cypher's
    GROUP-BY-what-you-didn't-aggregate rule translated to a
    groupBy/agg."""
    from threat_intelligence_knowledge_graph_spark.plans.cypher_lite import (
        cypher_query,
    )

    nodes, edges = _cypher_graph(spark, sf_dir)
    return cypher_query(
        spark,
        "MATCH (m:Malware)-[:COMMUNICATES_WITH]->(d:Domain)"
        "-[:RESOLVES_TO]->(i:Ipv4) "
        "RETURN m.size AS size, count(*) AS n",
        nodes=nodes,
        edges=edges,
    )


def q_graph_diameter(spark, sf_dir):
    """Two-sweep (double-BFS) diameter lower bound over the planted
    chain+region graph, undirected. Deterministic end to end: seed =
    min node id, each sweep's far node = min-id among max-dist, so the
    DuckDB oracle replays the identical two recursive-CTE walks with
    the same ORDER BY dist DESC, id LIMIT 1 picks. max_hops=60 on a
    30-node graph can never truncate, so the flag is analytically
    false on both sides."""
    from threat_intelligence_knowledge_graph_spark.operators.graph_algos import (
        diameter_two_sweep,
    )

    return diameter_two_sweep(_chain_region_edges(spark, sf_dir), max_hops=60)


def q_graph_stats(spark, sf_dir):
    """One-row graph summary card (n_nodes/n_edges/avg_degree/
    max_degree/Newman assortativity) over the planted chain+region
    graph. Every term is a sum over edges/degrees, so the oracle is the
    identical arithmetic in SQL; round-6 on the two ratios."""
    from threat_intelligence_knowledge_graph_spark.operators.graph_algos import (
        graph_stats,
    )

    return graph_stats(_chain_region_edges(spark, sf_dir))


def q_graph_kcore(spark, sf_dir):
    """k-core membership (k=2) over a planted 30-node graph from
    `nation`: an open chain n0—n1—…—n24 plus region edges n_i—r_(i%5)
    for i<10. n24 has degree 1, so synchronous peeling cascades one
    chain node per round from the n24 end (15 rounds to fixpoint —
    deep-loop exercise); the surviving core is {n0..n9, r0..r4} with
    in-core degrees. The peel update is set-valued and deterministic,
    so the DuckDB oracle unrolls the same recurrence (20 rounds — no-op
    past the fixpoint) and both sides agree exactly."""
    from threat_intelligence_knowledge_graph_spark.operators.graph_algos import (
        k_core,
    )

    return k_core(_chain_region_edges(spark, sf_dir), k=2, max_iter=20)


def _truss_gadget_edges(spark, sf_dir):
    """Planted truss gadgets: every 29th orderkey k gets nodes
    g{k}_0..g{k}_8 with a K4 core {0,1,2,3}, a side triangle {3,4,5},
    a pendant edge 5—6, a hanging triangle {0,1,7} and a second-tier
    triangle {0,7,8}. Under k=4 (support ≥ 2) the peel CASCADES:
    round 1 drops (0,8),(7,8),(1,7),(5,6) and the side-triangle edges,
    round 2 drops (0,7) — whose only support, the {0,7,8}/{0,1,7}
    wedges, died in round 1 — leaving exactly the K4 with in-truss
    support 2 per edge. Multi-round edge-wise peel, analytically
    exact."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 29 == 0)
    node = lambda i: F.concat(  # noqa: E731
        F.lit("g"), F.col("o_orderkey").cast("string"), F.lit(f"_{i}")
    )
    pairs = [
        (0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3),
        (3, 4), (3, 5), (4, 5), (5, 6),
        (0, 7), (1, 7), (0, 8), (7, 8),
    ]
    return o.select(
        F.explode(
            F.array(
                *[
                    F.struct(node(a).alias("src"), node(b).alias("dst"))
                    for a, b in pairs
                ]
            )
        ).alias("e")
    ).select("e.src", "e.dst")


def q_graph_ktruss(spark, sf_dir):
    """4-truss (every edge in ≥ 2 in-truss triangles) over the planted
    cascade gadgets — see _truss_gadget_edges for why the peel takes
    two genuine rounds. The synchronous edge-peel update is set-valued
    and deterministic, so the DuckDB oracle unrolls the identical
    wedge-join + coalesce-0 + filter recurrence (6 rounds, no-op past
    the fixpoint) and both sides agree exactly, including the
    converged in-truss ``support`` column."""
    from threat_intelligence_knowledge_graph_spark.operators.graph_algos import (
        k_truss,
    )

    return k_truss(_truss_gadget_edges(spark, sf_dir), k=4, max_iter=10)


def q_graph_harmonic_closeness(spark, sf_dir):
    """Harmonic centrality over the planted chain+region graph (the
    q_graph_kcore topology) from seeds {n0, n5, r2}: one per-source BFS
    sweep (all seeds advance in the same loop) + Σ 1/d, rounded to 6
    BEFORE comparison. Oracle = recursive-CTE walk per seed."""
    from threat_intelligence_knowledge_graph_spark.operators.graph_algos import (
        harmonic_closeness,
    )

    seeds = spark.createDataFrame([("n0",), ("n5",), ("r2",)], ["id"])
    return harmonic_closeness(
        _chain_region_edges(spark, sf_dir), seeds, max_hops=30
    )


def q_graph_sssp_weighted(spark, sf_dir):
    """Weighted single-source shortest paths (frontier Bellman–Ford)
    over a planted weighted DAG from `nation`: chain n_i→n_{i+1} with
    weight (i%3)+1 plus shortcut n_i→n_{i+5} weight 3 for i%5==0 —
    shortest paths genuinely mix shortcuts and chain tails. Integer
    weights in doubles → every distance exact; oracle = unrolled
    Bellman–Ford recurrence (12 rounds, fixpoint-safe no-ops past the
    longest shortest path's 8 edges)."""
    from threat_intelligence_knowledge_graph_spark.operators.graph_algos import (
        sssp_weighted,
    )

    nat = _t(spark, sf_dir, "nation").select("n_nationkey")
    nkey = F.concat(F.lit("n"), F.col("n_nationkey").cast("string"))
    chain = nat.filter(F.col("n_nationkey") < 24).select(
        nkey.alias("src"),
        F.concat(F.lit("n"), (F.col("n_nationkey") + 1).cast("string")).alias(
            "dst"
        ),
        ((F.col("n_nationkey") % 3) + 1).cast("double").alias("weight"),
    )
    cuts = nat.filter(
        (F.col("n_nationkey") % 5 == 0) & (F.col("n_nationkey") < 20)
    ).select(
        nkey.alias("src"),
        F.concat(F.lit("n"), (F.col("n_nationkey") + 5).cast("string")).alias(
            "dst"
        ),
        F.lit(3.0).alias("weight"),
    )
    src = spark.createDataFrame([("n0",)], ["id"])
    return sssp_weighted(chain.union(cuts), src, max_iter=12)


def q_graph_mst(spark, sf_dir):
    """Minimum spanning forest via distributed Borůvka
    (operators/mst.py::boruvka_mst — the single-linkage-clustering
    backbone) over a planted analytic graph from `orders`: nodes are
    the first 256 row_number ranks, path edges (i, i+1) with zig-zag
    weights 100·(i%2)+i+10 (phase 1 selects only the even edges, so
    multi-phase contraction is genuinely exercised) and chords
    (i, i+2) at weight 100000+i — each chord is the unique heaviest
    edge of its triangle, so the MSF is EXACTLY the path, which the
    oracle selects analytically (weight < 100000). Distinct weights →
    unique MSF; integer-valued doubles → exact cross-engine."""
    from threat_intelligence_knowledge_graph_spark.operators.mst import (
        boruvka_mst,
    )
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders").select("o_orderkey")
    idx = (
        o.select(
            (F.row_number().over(Window.orderBy("o_orderkey")) - 1).alias("i")
        )
        .filter(F.col("i") < 256)
    )
    a, b = idx.alias("a"), idx.alias("b")
    ai = F.col("a.i")
    path = a.join(b, F.col("b.i") == ai + 1).select(
        ai.alias("src"),
        F.col("b.i").alias("dst"),
        (F.lit(100) * (ai % 2) + ai + 10).cast("double").alias("weight"),
    )
    chords = a.join(b, F.col("b.i") == ai + 2).select(
        ai.alias("src"),
        F.col("b.i").alias("dst"),
        (F.lit(100000) + ai).cast("double").alias("weight"),
    )
    return boruvka_mst(path.unionByName(chords))


def q_graph_single_linkage(spark, sf_dir):
    """Single-linkage clusters (operators/mst.py::single_linkage_labels
    — cut the Borůvka MSF at a distance threshold; components ARE the
    dendrogram level) over the same planted chord-triangle graph as
    q_graph_mst, threshold 109: even path edges (i, i+1) with i ≤ 98
    survive (weight i+10 ≤ 108), every odd edge (weight 110+i) and
    every later even edge (weight ≥ 110) is cut — clusters are
    analytically the pairs {2k, 2k+1} for i ≤ 99 and singletons above,
    which the oracle states in closed form (i − i%2 below 100, i
    above)."""
    from threat_intelligence_knowledge_graph_spark.operators.mst import (
        single_linkage_labels,
    )
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders").select("o_orderkey")
    idx = (
        o.select(
            (F.row_number().over(Window.orderBy("o_orderkey")) - 1).alias("i")
        )
        .filter(F.col("i") < 256)
    )
    a, b = idx.alias("a"), idx.alias("b")
    ai = F.col("a.i")
    path = a.join(b, F.col("b.i") == ai + 1).select(
        ai.alias("src"),
        F.col("b.i").alias("dst"),
        (F.lit(100) * (ai % 2) + ai + 10).cast("double").alias("weight"),
    )
    chords = a.join(b, F.col("b.i") == ai + 2).select(
        ai.alias("src"),
        F.col("b.i").alias("dst"),
        (F.lit(100000) + ai).cast("double").alias("weight"),
    )
    return single_linkage_labels(path.unionByName(chords), threshold=109.0)


def q_graph_betweenness(spark, sf_dir):
    """Sampled Brandes betweenness over a planted directed graph from
    `nation`: chain n0→…→n11, parallel rails n_i→p_i→n_{i+2} at
    i∈{2,6} (σ doubles past each rail — exercises path counting), and
    region sinks n_i→r_(i%3) for i<6; sources {n0, n4}. Oracle =
    the same forward-σ/backward-δ recurrence unrolled level by level
    (13 levels, fixpoint-safe empties past the 11-deep chain)."""
    from threat_intelligence_knowledge_graph_spark.operators.graph_algos import (
        betweenness,
    )

    nat = _t(spark, sf_dir, "nation").select("n_nationkey")
    nkey = F.concat(F.lit("n"), F.col("n_nationkey").cast("string"))
    chain = nat.filter(F.col("n_nationkey") < 11).select(
        nkey.alias("src"),
        F.concat(F.lit("n"), (F.col("n_nationkey") + 1).cast("string")).alias("dst"),
    )
    rail_out = nat.filter(F.col("n_nationkey").isin(2, 6)).select(
        nkey.alias("src"),
        F.concat(F.lit("p"), F.col("n_nationkey").cast("string")).alias("dst"),
    )
    rail_in = nat.filter(F.col("n_nationkey").isin(2, 6)).select(
        F.concat(F.lit("p"), F.col("n_nationkey").cast("string")).alias("src"),
        F.concat(F.lit("n"), (F.col("n_nationkey") + 2).cast("string")).alias("dst"),
    )
    sinks = nat.filter(F.col("n_nationkey") < 6).select(
        nkey.alias("src"),
        F.concat(F.lit("r"), (F.col("n_nationkey") % 3).cast("string")).alias("dst"),
    )
    edges = chain.union(rail_out).union(rail_in).union(sinks)
    srcs = spark.createDataFrame([("n0",), ("n4",)], ["id"])
    return betweenness(edges, srcs, max_hops=13)


def q_text_unigram_logprob(spark, sf_dir):
    """Unigram-LM quality signal (CCNet/Gopher perplexity-proxy): mean
    ln p(token) per document under the corpus's own MLE unigram model.
    Same tokenizer as tfidf_top_terms; rounded post-mean."""
    from threat_intelligence_knowledge_graph_spark.operators.text_quality import (
        unigram_logprob,
    )

    return unigram_logprob(_t(spark, sf_dir, "documents"))


def q_text_bigram_logprob(spark, sf_dir):
    """Bigram-LM quality signal (order-2 of the CCNet/KenLM perplexity
    family): mean ln p(w2|w1) per document under the corpus's own MLE
    bigram model. Same tokenizer as unigram_logprob; rounded
    post-mean."""
    from threat_intelligence_knowledge_graph_spark.operators.text_quality import (
        bigram_logprob,
    )

    return bigram_logprob(_t(spark, sf_dir, "documents"))


def q_source_datasheet(spark, sf_dir):
    """Per-source dataset-card rollup: doc counts, exact-dup rate
    (md5 identity), language spread, distinct vocabulary — the
    composition sheet next to corpus_fertility's token budget."""
    from threat_intelligence_knowledge_graph_spark.operators.text_quality import (
        source_datasheet,
    )

    return source_datasheet(_t(spark, sf_dir, "documents"))


def q_dsir_weights(spark, sf_dir):
    """DSIR importance log-weights (Xie et al. 2023): every document
    scored by the smoothed log-likelihood ratio of its hashed
    unigram+bigram bag under the src0 target distribution vs the raw
    corpus's own. Every ln argument is an exact integer; rounded
    post-sum."""
    from threat_intelligence_knowledge_graph_spark.operators.dsir import (
        dsir_logratio,
    )

    docs = _t(spark, sf_dir, "documents")
    return dsir_logratio(docs, docs.filter("source = 'src0'"), dim=512)


def q_dsir_resample(spark, sf_dir):
    """DSIR Gumbel-top-k resample: 100 docs drawn without replacement
    proportionally to exp(log_weight) via hash-seeded standard-Gumbel
    noise; key rounded BEFORE ranking, ties broken on doc_id, so the
    selected set is a deterministic total-order prefix on any engine."""
    from threat_intelligence_knowledge_graph_spark.operators.dsir import (
        dsir_resample,
    )

    docs = _t(spark, sf_dir, "documents")
    return dsir_resample(docs, docs.filter("source = 'src0'"), 100, dim=512)


def q_ip_cidr_enrich(spark, sf_dir):
    """IP→CIDR block enrichment with longest-prefix match: the IOC
    corpus's 10.a.b.c addresses against 25 /16 blocks (from nation)
    plus a covering 10.0.0.0/8 — every IP matches the /8, a < 25 also
    matches its /16 and the routing rule must pick it. The bucketized
    containment join runs Spark-side; the oracle is DuckDB's native
    inequality join + window — an independent plan."""
    from threat_intelligence_knowledge_graph_spark.operators.enrich import (
        ip_cidr_enrich,
    )

    o = _t(spark, sf_dir, "orders")
    ips = o.select(
        F.col("o_orderkey").alias("ip_id"),
        F.concat(
            F.lit("10."),
            (F.col("o_orderkey") % 250).cast("string"),
            F.lit("."),
            ((F.col("o_orderkey") * 7) % 250).cast("string"),
            F.lit("."),
            ((F.col("o_orderkey") % 249) + 1).cast("string"),
        ).alias("ip"),
    )
    nat = _t(spark, sf_dir, "nation").select(
        F.concat(
            F.lit("10."), F.col("n_nationkey").cast("string"), F.lit(".0.0/16")
        ).alias("cidr"),
        F.concat(F.lit("net-"), F.col("n_nationkey").cast("string")).alias(
            "label"
        ),
    )
    corp = spark.createDataFrame([("10.0.0.0/8", "corp")], ["cidr", "label"])
    return ip_cidr_enrich(ips, nat.union(corp)).select(
        "ip_id", "ip", "cidr", "label"
    )


def q_feature_hash(spark, sf_dir):
    """Hashing-trick featurization of the documents table: sparse
    (doc, idx, weight) at dim=1024 with a ±1 sign hash — vocabulary-
    free classifier features, bit-reproducible across engines via the
    md5_number_upper family (collisions and sign cancellations match
    exactly)."""
    from threat_intelligence_knowledge_graph_spark.operators.text_quality import (
        feature_hash,
    )

    return feature_hash(_t(spark, sf_dir, "documents"), dim=1024)


def q_quality_model_score(spark, sf_dir):
    """Model-based quality filtering (fastText/DCLM-style): a pinned
    linear model over the dim=1024 hashing-trick features —
    score = round(sigmoid(dot + bias), 6), keep = score >= 0.5.
    Weights come from the deterministic md5 hash grid (the stand-in
    for a trained model's exported (idx, w) frame), so the oracle
    recomputes the exact same model; the corpus is scanned once and
    the weight table is broadcast."""
    from threat_intelligence_knowledge_graph_spark.operators.text_quality import (
        hash_grid_weights,
        quality_model_score,
    )

    return quality_model_score(
        _t(spark, sf_dir, "documents"),
        hash_grid_weights(spark, dim=1024),
        dim=1024,
    )


def q_bloom_prefilter(spark, sf_dir):
    """Bloom-filter semi-join pruning end-to-end: build a deliberately
    tight 4096-bit / 3-hash filter over the o_orderkey%7 member set,
    probe EVERY orderkey. The md5 hash family is engine-portable, so
    the false positives — the probabilistic part — match bit-for-bit;
    members are always True (no false negatives, pytest-asserted)."""
    from threat_intelligence_knowledge_graph_spark.operators.sketches import (
        bloom_build,
        bloom_might_contain,
    )

    o = _t(spark, sf_dir, "orders")
    members = o.filter(F.col("o_orderkey") % 7 == 0).select(
        F.col("o_orderkey").cast("string").alias("k")
    )
    bloom = bloom_build(members, "k", m_bits=4096, k=3)
    probes = o.select(
        F.col("o_orderkey").alias("key_id"),
        F.col("o_orderkey").cast("string").alias("k"),
    )
    return bloom_might_contain(probes, bloom, "k", m_bits=4096, k=3).select(
        "key_id", "might_contain"
    )


def q_domain_registrable(spark, sf_dir):
    """eTLD+1 rollup over constructed hostnames covering every PSL
    branch (depth-2 suffix, depth-1, PSL'd platform subdomain,
    unlisted TLD → NULLs, bare suffix → NULL registrable). The Spark
    side runs the real longest-suffix operator; the oracle derives the
    answer analytically per case — independent, not a replay."""
    from threat_intelligence_knowledge_graph_spark.operators.domains import (
        registrable_domain,
    )

    o = _t(spark, sf_dir, "orders")
    k = F.col("o_orderkey").cast("string")
    m = F.col("o_orderkey") % 5
    host = (
        F.when(m == 0, F.concat(F.lit("www.evil-"), k, F.lit(".co.uk")))
        .when(m == 1, F.concat(F.lit("cdn.evil-"), k, F.lit(".com")))
        .when(m == 2, F.concat(F.lit("u"), k, F.lit(".github.io")))
        .when(m == 3, F.concat(F.lit("evil-"), k, F.lit(".zz")))
        .otherwise(F.lit("github.io"))
    )
    hosts = o.select(F.col("o_orderkey").alias("host_id"), host.alias("host"))
    return registrable_domain(hosts)


def q_cms_user_counts(spark, sf_dir):
    """Count-min sketch end-to-end: build a deliberately tight 3×32
    sketch over events.user_id (collisions guaranteed at sf0.01), then
    point-estimate every distinct user and pair with the exact count.
    The md5_number_upper hash family makes every cell bit-identical on
    both engines, so collisions — the interesting part — match too;
    est ≥ exact always (pytest asserts the guarantee)."""
    from threat_intelligence_knowledge_graph_spark.operators.sketches import (
        cms_build,
        cms_estimate,
    )

    e = _t(spark, sf_dir, "events").select("user_id")
    sketch = cms_build(e, "user_id", depth=3, width=32)
    est = cms_estimate(sketch, e.distinct(), "user_id", depth=3, width=32)
    exact = e.groupBy("user_id").agg(F.count("*").alias("exact_count"))
    return est.join(exact, "user_id").select(
        "user_id", "cms_count", "exact_count"
    )


def q_graph_scc(spark, sf_dir):
    """Strongly connected components over a planted directed motif per
    sampled orderkey (10 nodes: a 3-cycle feeding a chain into a
    2-cycle, plus a diamond whose sink node's forward color class root
    is NOT backward-reachable — that node resolves only in coloring
    round 2, so the outer loop is genuinely exercised). The oracle
    computes mutual reachability independently via a recursive-CTE
    transitive closure; scc_id = min node id of the component on both
    sides."""
    from threat_intelligence_knowledge_graph_spark.operators.graph_algos import (
        strongly_connected_components,
    )

    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 13 == 0)
    pairs = [
        (0, 1), (1, 2), (2, 0),          # 3-cycle
        (2, 3), (3, 4), (4, 5), (5, 4),  # chain into a 2-cycle
        (6, 8), (6, 9), (8, 7), (9, 7),  # diamond: 7 needs round 2
    ]
    offs = F.explode(
        F.array(
            *[
                F.struct(F.lit(a).alias("a"), F.lit(b).alias("b"))
                for a, b in pairs
            ]
        )
    )
    edges = (
        o.select((F.col("o_orderkey") * 10).alias("base"), offs.alias("p"))
        .select(
            (F.col("base") + F.col("p.a")).alias("src"),
            (F.col("base") + F.col("p.b")).alias("dst"),
        )
    )
    return strongly_connected_components(edges)


def q_graph_random_walks(spark, sf_dir):
    """Deterministic hash-seeded random walks (node2vec/DeepWalk
    sampling) over the symmetrized chain+region graph: 2 walks per
    node, 4 steps, next hop = argmin md5(walk_id|step|neighbor). The
    hash draw makes the 'random' choice a pure function both engines
    compute identically — the oracle unrolls the 4 steps with DuckDB's
    arg_min over the same md5 key."""
    from threat_intelligence_knowledge_graph_spark.operators.graph_algos import (
        random_walks,
    )

    e0 = _chain_region_edges(spark, sf_dir)
    e = e0.union(
        e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    return random_walks(e, walk_length=4, walks_per_node=2).select(
        "walk_id", F.col("start").alias("start_id"), "step", "node"
    )


def q_graph_walk_pmi(spark, sf_dir):
    """Sparse PPMI node embedding from the deterministic walks
    (Levy & Goldberg 2014: SGNS factorizes shifted PPMI, so the PPMI
    rows ARE the embedding — no SGD, no RNG). Same symmetrized
    chain+region graph and walk parameters as graph_random_walks; the
    oracle reuses the unrolled walk CTE, pairs in-walk positions at
    distance <= 2, and applies the identical integer-exact positivity
    test before the (rounded) float ln."""
    from threat_intelligence_knowledge_graph_spark.operators.graph_algos import (
        walk_pmi_embedding,
    )

    e0 = _chain_region_edges(spark, sf_dir)
    e = e0.union(
        e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    return walk_pmi_embedding(e, walk_length=4, walks_per_node=2, window=2)


def q_graph_hits(spark, sf_dir):
    """HITS hubs & authorities (3 synchronous L2-normalized steps,
    GDS gds.hits analog) over the planted directed nation graph of
    q_graph_pagerank (25-cycle over n-nodes + nation→region edges; the
    5 r-nodes have no out-edges → hub 0, exercising the zero-row
    coalesce). With a fixed iteration count the update is a
    deterministic float recurrence (sum, divide, sqrt are all exactly
    rounded), so the DuckDB oracle unrolls the identical arithmetic;
    both sides round to 9 decimals (summation-order noise ~1e-16)."""
    from threat_intelligence_knowledge_graph_spark.operators.hits import hits

    nat = _t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    nkey = F.concat(F.lit("n"), F.col("n_nationkey").cast("string"))
    cyc = nat.select(
        nkey.alias("src_id"),
        F.concat(
            F.lit("n"), ((F.col("n_nationkey") + 1) % 25).cast("string")
        ).alias("dst_id"),
    )
    reg = nat.select(
        nkey.alias("src_id"),
        F.concat(F.lit("r"), F.col("n_regionkey").cast("string")).alias("dst_id"),
    )
    scores = hits(cyc.union(reg), iterations=3)
    return scores.select(
        "id", F.round("hub", 9).alias("hub"), F.round("auth", 9).alias("auth")
    )


def q_graph_katz(spark, sf_dir):
    """Truncated Katz centrality (3 affine steps, α=0.1, β=1) over the
    planted directed nation graph of q_graph_hits — pure affine float
    recurrence, so the DuckDB oracle unrolls the identical arithmetic;
    both sides round to 6 (summation-order noise ~1e-16)."""
    from threat_intelligence_knowledge_graph_spark.operators.graph_algos import (
        katz_centrality,
    )

    nat = _t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    nkey = F.concat(F.lit("n"), F.col("n_nationkey").cast("string"))
    cyc = nat.select(
        nkey.alias("src"),
        F.concat(
            F.lit("n"), ((F.col("n_nationkey") + 1) % 25).cast("string")
        ).alias("dst"),
    )
    reg = nat.select(
        nkey.alias("src"),
        F.concat(F.lit("r"), F.col("n_regionkey").cast("string")).alias("dst"),
    )
    return katz_centrality(cyc.union(reg), iterations=3)


def q_span_dup_stats(spark, sf_dir):
    """Substring-level duplication profile (Lee et al. 2021 at 6-token
    granularity): per document the count of positional 6-grams whose
    md5 occurs >= 2 times corpus-wide, the distinct token positions
    they cover, and the covered ratio. The near-dup families planted in
    `documents` make the coverage non-trivial; the oracle recomputes
    the identical positional-gram arithmetic in SQL."""
    from threat_intelligence_knowledge_graph_spark.operators.span_dedup import (
        duplicated_span_stats,
    )

    return duplicated_span_stats(
        _t(spark, sf_dir, "documents"), n=6, min_occurrences=2
    )


def q_span_scrub(spark, sf_dir):
    """Duplicated-span removal (Lee et al. substring dedup at 6-token
    granularity): every token covered by a corpus-duplicated 6-gram is
    dropped; output is the normalized token stream re-joined with
    single spaces. Wholly-boilerplate docs scrub to ''."""
    from threat_intelligence_knowledge_graph_spark.operators.span_dedup import (
        scrub_duplicated_spans,
    )

    return scrub_duplicated_spans(
        _t(spark, sf_dir, "documents"), n=6, min_occurrences=2
    )


def q_kmv_distinct_users(spark, sf_dir):
    """KMV distinct-count sketch (k=256) over events.user_id: the k
    smallest md5-family hashes of the distinct keys + the classic
    (k-1)·2^64/h_(k) estimate. The md5 hash family is bit-identical
    across engines, so the sketch contents AND the estimate (double
    division of the same two exact values) match the oracle exactly."""
    from threat_intelligence_knowledge_graph_spark.operators.sketches import (
        kmv_build,
        kmv_estimate,
    )

    ev = _t(spark, sf_dir, "events").select("user_id")
    return kmv_estimate(kmv_build(ev, "user_id", k=256), k=256)


def q_events_percentiles_exact(spark, sf_dir):
    """Per-event-type exact nearest-rank percentiles (p50/p90/p99) of
    events.value: the value at ordered row ceil(q·n) with event_id
    tiebreak — pure integer/comparison logic, no interpolation
    arithmetic to diverge cross-engine (the interpolating
    `events_percentiles` twin survives only because of its 4-decimal
    rounding; this one is exact at full precision and extends to any
    q without re-auditing float behavior)."""
    from threat_intelligence_knowledge_graph_spark.operators.stats import (
        exact_percentiles,
    )

    return exact_percentiles(
        _t(spark, sf_dir, "events"), "value", "event_type", "event_id",
        qs=(0.5, 0.9, 0.99),
    )


def q_embeddings_kmeans(spark, sf_dir):
    """Integer-exact Lloyd k-means (k=4, 2 rounds, scale 1024) over the
    embeddings table: components quantized to the integer grid once
    (floor(x·1024 + 0.5)), so distance and centroid sums are order-
    independent integer arithmetic and the assignment is bit-identical
    on any engine/partitioning — the deterministic coarse quantizer the
    IVF ANN path and mixture balancing need. Seeds = 4 smallest ids."""
    from threat_intelligence_knowledge_graph_spark.operators.clustering import (
        kmeans_assign,
    )

    return kmeans_assign(
        _t(spark, sf_dir, "embeddings"), k=4, iterations=2, scale=1024
    )


def _synth_transcripts(spark, sf_dir):
    """Deterministic multi-turn transcripts in the pipeline's input
    shape (conv_id, turn_idx, role, text, tool, ts): conv = order,
    turns 1..(o_orderkey % 7 + 2) via sequence-explode (turn_idx UNIQUE
    per conv by construction — lineitem's l_linenumber has duplicate
    keys in the synthetic data, which would make the lag window's tie
    order engine-dependent), roles drawn irregularly from
    {user, assistant, tool} by (okey + turn²) mod 3 so all 9 role
    transitions occur, tool names keyed by (okey + turn), ts on an
    irregular-but-monotone
    epoch grid (gaps 24..56 s) so latency stats are non-trivial. The
    oracle rebuilds the identical table in SQL."""
    o = _t(spark, sf_dir, "orders")
    okey = F.col("o_orderkey")
    rows = o.select(
        okey,
        F.explode(
            F.sequence(F.lit(1).cast("long"), okey % 7 + 2)
        ).alias("turn_idx"),
    )
    i = F.col("turn_idx")
    role_idx = ((okey + i * i) % 3).cast("int")
    role = F.element_at(
        F.array(F.lit("user"), F.lit("assistant"), F.lit("tool")),
        role_idx + 1,
    )
    tool = F.when(
        role == "tool",
        F.element_at(
            F.array(
                F.lit("search"), F.lit("browser"), F.lit("python"), F.lit("sql")
            ),
            ((okey + i) % 4).cast("int") + 1,
        ),
    )
    text = F.concat(
        F.lit("turn "), i.cast("string"),
        F.lit(" of conv "), okey.cast("string"),
        F.lit(" re order "), ((okey * 31 + i * 7) % 1000).cast("string"),
    )
    ts_sec = (
        F.lit(1600000000) + okey * 1000 + i * 40 + (okey * 7 + i * i) % 17
    )
    return rows.select(
        okey.cast("string").alias("conv_id"),
        i.cast("int").alias("turn_idx"),
        role.alias("role"),
        text.alias("text"),
        tool.alias("tool"),
        F.timestamp_seconds(ts_sec).alias("ts"),
    )


_SYNTH_TRANSCRIPTS_SQL = """
          SELECT cast(o_orderkey AS varchar) AS conv_id,
                 cast(i AS int) AS turn_idx,
                 (['user','assistant','tool'])[((o_orderkey + i * i) % 3) + 1]
                   AS role,
                 'turn ' || cast(i AS varchar)
                 || ' of conv ' || cast(o_orderkey AS varchar)
                 || ' re order '
                 || cast((o_orderkey * 31 + i * 7) % 1000 AS varchar)
                   AS text,
                 CASE WHEN ((o_orderkey + i * i) % 3) = 2
                      THEN (['search','browser','python','sql'])
                             [((o_orderkey + i) % 4) + 1] END AS tool,
                 1600000000 + o_orderkey * 1000 + i * 40
                 + (o_orderkey * 7 + i * i) % 17 AS epoch
          FROM orders,
               UNNEST(generate_series(1, (o_orderkey % 7) + 2)) AS t(i)
"""


def _synth_transcripts_pii(spark, sf_dir):
    """The shared synthetic transcripts with DETERMINISTIC planted PII:
    modulo-gated suffixes append an email, a formatted phone, a bare
    10-digit phone, an SSN, a 16-digit card, and a 15-digit Amex —
    every PII_PATTERNS class occurs, gated on coprime moduli (5, 7, 11,
    13, 17) so classes overlap on some turns and miss others. The
    oracle rebuilds the identical text in SQL (same concat, same lpad,
    same moduli)."""
    t = _synth_transcripts(spark, sf_dir)
    o = F.col("conv_id").cast("long")
    i = F.col("turn_idx").cast("long")

    def pad4(e):
        return F.lpad(e.cast("string"), 4, "0")

    sfx = F.concat(
        F.when(
            (o + i) % 5 == 0,
            F.concat(
                F.lit(" reach me at agent"),
                (o % 97).cast("string"),
                F.lit("@corp.example.com"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            (o + i) % 7 == 1,
            F.concat(F.lit(" call (555) 123-"), pad4((o * 3 + i) % 10000)),
        ).otherwise(F.lit("")),
        F.when(
            (o + i) % 7 == 3,
            F.concat(F.lit(" or 555123"), pad4((o + i * 11) % 10000)),
        ).otherwise(F.lit("")),
        F.when(
            (o + i) % 11 == 2,
            F.concat(F.lit(" ssn 123-45-"), pad4((o + i) % 10000)),
        ).otherwise(F.lit("")),
        F.when(
            (o + i) % 13 == 3,
            F.concat(F.lit(" card 4111 1111 1111 "), pad4((o + i) % 10000)),
        ).otherwise(F.lit("")),
        F.when((o + i) % 17 == 4, F.lit(" amex 3714 496353 98431")).otherwise(
            F.lit("")
        ),
    )
    return t.withColumn("text", F.concat(F.col("text"), sfx))


_SYNTH_PII_SUFFIX_SQL = """
            || CASE WHEN (o + i) % 5 = 0
                 THEN ' reach me at agent' || cast(o % 97 AS varchar)
                      || '@corp.example.com' ELSE '' END
            || CASE WHEN (o + i) % 7 = 1
                 THEN ' call (555) 123-'
                      || lpad(cast((o * 3 + i) % 10000 AS varchar), 4, '0')
                 ELSE '' END
            || CASE WHEN (o + i) % 7 = 3
                 THEN ' or 555123'
                      || lpad(cast((o + i * 11) % 10000 AS varchar), 4, '0')
                 ELSE '' END
            || CASE WHEN (o + i) % 11 = 2
                 THEN ' ssn 123-45-'
                      || lpad(cast((o + i) % 10000 AS varchar), 4, '0')
                 ELSE '' END
            || CASE WHEN (o + i) % 13 = 3
                 THEN ' card 4111 1111 1111 '
                      || lpad(cast((o + i) % 10000 AS varchar), 4, '0')
                 ELSE '' END
            || CASE WHEN (o + i) % 17 = 4
                 THEN ' amex 3714 496353 98431' ELSE '' END
"""


def q_transcript_pii_audit(spark, sf_dir):
    """PII-leakage audit over the planted-PII transcripts
    (operators/text_quality.py::pii_audit): per (role, pii_class)
    total occurrences, leaking turns, and distinct leaking
    conversations, counted SEQUENTIALLY in scrub order (class k counted
    with classes 0..k-1 already replaced — exactly the placeholders
    scrub_pii would emit). All-integer output; the oracle interpolates
    the same PII_PATTERNS strings under RE2."""
    from threat_intelligence_knowledge_graph_spark.operators.text_quality import (
        pii_audit,
    )

    return pii_audit(_synth_transcripts_pii(spark, sf_dir))


def _pii_audit_oracle_sql() -> str:
    """Per-class sequential counts generated from PII_PATTERNS (same
    strings, same order) over the SQL twin of the planted-PII
    transcripts."""
    from threat_intelligence_knowledge_graph_spark.operators.text_quality import (
        PII_PATTERNS,
    )

    arms = []
    for k, (pat, repl) in enumerate(PII_PATTERNS):
        cls = repl.strip("<>")
        expr = "text"
        for ppat, prepl in PII_PATTERNS[:k]:
            expr = f"regexp_replace({expr}, '{ppat}', '{prepl}', 'g')"
        arms.append(
            f"SELECT role, conv_id, '{cls}' AS pii_class,\n"
            f"       len(regexp_extract_all({expr}, '{pat}')) AS cnt FROM t"
        )
    union = "\n          UNION ALL\n          ".join(arms)
    return f"""
        WITH base AS ({_SYNTH_TRANSCRIPTS_SQL}),
        b2 AS (
          SELECT role, conv_id, text,
                 cast(conv_id AS bigint) AS o,
                 cast(turn_idx AS bigint) AS i
          FROM base
        ),
        t AS (
          SELECT role, conv_id, text {_SYNTH_PII_SUFFIX_SQL} AS text
          FROM b2
        ),
        c AS (
          {union}
        )
        SELECT role, pii_class,
               cast(sum(cnt) AS bigint) AS n_hits,
               cast(sum(CASE WHEN cnt > 0 THEN 1 ELSE 0 END) AS bigint)
                 AS n_turns,
               count(DISTINCT CASE WHEN cnt > 0 THEN conv_id END) AS n_convs
        FROM c GROUP BY role, pii_class
    """


def q_transcript_latency(spark, sf_dir):
    """Role-handoff latency profile over the shared synthetic
    transcripts (irregular-but-monotone ts grid): epoch-integer gaps
    in turn_idx order, exact integer sums and max, ONE round-6 mean
    division per (from_role, to_role) pair."""
    from threat_intelligence_knowledge_graph_spark.operators.transcript_stats import (
        response_latency,
    )

    return response_latency(_synth_transcripts(spark, sf_dir))


def q_transcript_tool_profile(spark, sf_dir):
    """Per-tool fleet profile over the shared synthetic transcripts:
    n_calls / conversation reach / post-call stall stats (epoch gap to
    the NEXT turn), last-turn calls counted but excluded from gap
    stats (n_gaps carries the effective sample size), ONE round-6
    mean division per tool."""
    from threat_intelligence_knowledge_graph_spark.operators.transcript_stats import (
        tool_profile,
    )

    return tool_profile(_synth_transcripts(spark, sf_dir))


def q_transcript_stats(spark, sf_dir):
    """Per-conversation transcript analytics (role mix, tool diversity,
    chars, duration, mean inter-turn gap, final role) over the
    pipeline's exact input shape — ONE conv_id exchange shared by the
    gap window and the aggregation."""
    from threat_intelligence_knowledge_graph_spark.operators.transcript_stats import (
        conversation_stats,
    )

    return conversation_stats(_synth_transcripts(spark, sf_dir))


def q_transcript_role_transitions(spark, sf_dir):
    """Corpus-wide consecutive-turn role-transition counts — the
    conversation-flow profile that surfaces malformed traces."""
    from threat_intelligence_knowledge_graph_spark.operators.transcript_stats import (
        role_transitions,
    )

    return role_transitions(_synth_transcripts(spark, sf_dir))


def _triage_loop_corpus(spark, sf_dir):
    """Synthetic transcripts with planted stutter runs: every 11th
    conversation has turns 3-5 overwritten with one constant string (a
    3-turn loop where the conversation is long enough) and every 23rd
    has turns 2-3 overwritten with another (a 2-turn stutter, below the
    min_run=3 looping bar). Base texts embed (conv, turn) so no
    accidental run exists — the planted runs are the only ones."""
    tr = _synth_transcripts(spark, sf_dir)
    key = F.col("conv_id").cast("long")
    return tr.withColumn(
        "text",
        F.when(
            (key % 11 == 0) & F.col("turn_idx").between(3, 5),
            F.lit("retrying tool call"),
        )
        .when(
            (key % 23 == 0) & F.col("turn_idx").between(2, 3),
            F.lit("echo"),
        )
        .otherwise(F.col("text")),
    )


def q_transcript_loops(spark, sf_dir):
    """Stuck-agent detection over the loop-planted transcripts:
    NULL-safe consecutive-text run lengths via a lag-flag cumulative
    sum, is_looping at min_run=3 — everything on ONE conv_id
    exchange."""
    from threat_intelligence_knowledge_graph_spark.operators.transcript_stats import (
        loop_detection,
    )

    return loop_detection(_triage_loop_corpus(spark, sf_dir), min_run=3)


def q_transcript_context_growth(spark, sf_dir):
    """Context-budget profile at budget_chars=150 over the shared
    synthetic transcripts (turn texts ~30 chars, conversations 2-8
    turns, so the corpus straddles the budget): first turn over budget,
    turns-over count and round-6 share, per conversation."""
    from threat_intelligence_knowledge_graph_spark.operators.transcript_stats import (
        context_growth,
    )

    return context_growth(_synth_transcripts(spark, sf_dir), budget_chars=150)


def _triage_error_corpus(spark, sf_dir):
    """Synthetic transcripts with planted tool failures: every tool
    turn where (conv_key + turn_idx) % 5 = 0 gets ' ERROR: tool failed'
    appended — a deterministic ~20% failure rate spread across all four
    tools. Base texts never match the error pattern."""
    tr = _synth_transcripts(spark, sf_dir)
    key = F.col("conv_id").cast("long")
    return tr.withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.when(
                (F.col("role") == "tool")
                & ((key + F.col("turn_idx")) % 5 == 0),
                F.lit(" ERROR: tool failed"),
            ).otherwise(F.lit("")),
        ),
    )


def q_transcript_tool_errors(spark, sf_dir):
    """Per-tool failure profile over the error-planted transcripts:
    regex error detection (scan-local), round-6 error rate,
    conversation blast radius — one map-side aggregate to |tools|
    rows."""
    from threat_intelligence_knowledge_graph_spark.operators.transcript_stats import (
        tool_errors,
    )

    return tool_errors(_triage_error_corpus(spark, sf_dir))


def q_transcript_tool_chains(spark, sf_dir):
    """Tool-workflow graph of the agent fleet: consecutive tool-call
    transitions (user/assistant turns skipped) with conversation reach,
    from a scan-local filter + one conv_id lag window."""
    from threat_intelligence_knowledge_graph_spark.operators.transcript_stats import (
        tool_chains,
    )

    return tool_chains(_synth_transcripts(spark, sf_dir))


def _curate_transcripts_base(spark, sf_dir):
    """Synthetic transcripts with one planted failure per content
    stage: every 19th conversation gets turn 2 emptied (structural
    invalid), every 11th gets turns 3-5 overwritten with one constant
    (a stuck-agent loop). Plantings touch disjoint turns, so a
    conversation can carry several and the fixed precedence decides."""
    tr = _synth_transcripts(spark, sf_dir)
    key = F.col("conv_id").cast("long")
    return tr.withColumn(
        "text",
        F.when((key % 19 == 0) & (F.col("turn_idx") == 2), F.lit(""))
        .when(
            (key % 11 == 0) & F.col("turn_idx").between(3, 5),
            F.lit("retrying tool call"),
        )
        .otherwise(F.col("text")),
    )


def _curate_transcripts_corpus(spark, sf_dir):
    """``_curate_transcripts_base`` plus every 13th conversation
    replayed byte-identically under a fresh ``_dup`` key AFTER the
    transforms (so the replay fingerprints identically)."""
    base = _curate_transcripts_base(spark, sf_dir)
    dups = base.filter(F.col("conv_id").cast("long") % 13 == 0).withColumn(
        "conv_id", F.concat(F.col("conv_id"), F.lit("_dup"))
    )
    return base.unionByName(dups)


def q_curate_transcripts(spark, sf_dir):
    """Composed conversation-level curation over the planted corpus:
    structural validity → loop rejection → exact replay dedup →
    context-budget gate (200 chars), first matching reason wins;
    every stage bites on its planted family."""
    from threat_intelligence_knowledge_graph_spark.plans.transcript_curation import (
        curate_transcripts,
    )

    return curate_transcripts(
        _curate_transcripts_corpus(spark, sf_dir),
        min_run=3,
        budget_chars=200,
    )


def q_curate_transcripts_increment(spark, sf_dir):
    """Steady-state incremental transcript curation
    (plans/transcript_curation.py::curate_transcripts_increment) — TWO
    increments against a throwaway warehouse, every verdict analytic:

    Batch 1 = the planted base corpus (empty-turn invalids every 19th
    conv, stuck loops every 11th; budget 200 chars). Batch 2 (conv ids
    z-prefixed, so monotone above batch 1's digit keys): every 13th
    base conv replayed byte-identically as ``z<k>r`` (→ ``invalid`` /
    ``looping`` when the original fails its own content stage, else
    ``exact_dup`` via the persisted fingerprint table — INCLUDING
    originals that were rejected ``over_budget``, which reached dedup
    and are canonical for their family), every 26th replayed AGAIN as
    ``z<k>r2`` (within-batch-2 dup of ``z<k>r``), and a fresh 2-turn
    conversation ``z<k>f`` per every-7th key (→ ``accepted``).

    Output: (batch, conv_id, status); the oracle replays both batches'
    verdict pipelines in SQL with the known-fingerprint set = batch 1's
    dedup-reaching fingerprints."""
    import shutil
    import tempfile

    from threat_intelligence_knowledge_graph_spark.plans.transcript_curation import (
        curate_transcripts_increment,
    )
    from threat_intelligence_knowledge_graph_spark.sources.tableio import (
        LocalTableCatalog,
    )

    cols = ["conv_id", "turn_idx", "role", "text"]
    b1 = _curate_transcripts_base(spark, sf_dir).select(*cols)
    key = F.col("conv_id").cast("long")

    def z(suffix):
        return F.concat(F.lit("z"), F.col("conv_id"), F.lit(suffix))

    replays = b1.filter(key % 13 == 0).withColumn("conv_id", z("r"))
    replays2 = b1.filter(key % 26 == 0).withColumn("conv_id", z("r2"))
    fresh = (
        b1.select("conv_id")
        .distinct()
        .filter(key % 7 == 0)
        .select(z("f").alias("conv_id"))
        .select(
            "conv_id",
            F.explode(F.array(F.lit(1), F.lit(2))).alias("_i"),
        )
        .select(
            "conv_id",
            F.col("_i").cast("int").alias("turn_idx"),
            F.when(F.col("_i") == 1, F.lit("user"))
            .otherwise(F.lit("assistant"))
            .alias("role"),
            F.concat(
                F.lit("fresh "),
                F.col("conv_id"),
                F.lit(" "),
                F.col("_i").cast("string"),
            ).alias("text"),
        )
    )
    b2 = replays.unionByName(replays2).unionByName(fresh)

    wh = tempfile.mkdtemp(prefix="tikg-contract-tincr-")
    try:
        catalog = LocalTableCatalog(wh)
        kw = dict(min_run=3, budget_chars=200)
        v1 = curate_transcripts_increment(spark, b1, catalog, run_id="b1", **kw)
        v2 = curate_transcripts_increment(spark, b2, catalog, run_id="b2", **kw)
        tag = lambda df, b: df.select(  # noqa: E731
            F.lit(b).alias("batch"),
            "conv_id",
            F.coalesce(F.col("reason"), F.lit("accepted")).alias("status"),
        )
        # materialize before the warehouse dir disappears
        return tag(v1, 1).unionByName(tag(v2, 2)).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(wh, ignore_errors=True)


def _line_dedup_corpus(spark, sf_dir):
    """Documents rebuilt as multi-line texts with planted boilerplate:
    every 3rd doc gains a constant header line, every 4th a constant
    footer, every 5th repeats its body line — so corpus-duplicated
    lines (headers/footers), within-doc repeats, and clean docs all
    occur. concat_ws skips NULL parts in both engines."""
    d = _t(spark, sf_dir, "documents")
    key = F.col("doc_id")
    return d.select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.when(key % 3 == 0, F.lit("=== boilerplate header ===")),
            F.col("text"),
            F.when(key % 5 == 0, F.col("text")),
            F.when(key % 4 == 0, F.lit("-- generated footer --")),
        ).alias("text"),
    )


def q_line_dedup(spark, sf_dir):
    """C4-style corpus-level line dedup (keep the globally first
    occurrence of any line occurring >= 2 times) over the planted
    boilerplate corpus: one md5-keyed count+min-position aggregation,
    one join back, per-doc ordered rejoin. Oracle: window count + first
    rank over the identical line stream."""
    from threat_intelligence_knowledge_graph_spark.operators.line_dedup import (
        dedup_lines,
    )

    return dedup_lines(_line_dedup_corpus(spark, sf_dir), min_count=2)


def q_transcript_outcomes(spark, sf_dir):
    """Per-conversation terminal-state triage labels over planted
    failures: every 11th conv gets a 3-turn stutter (→ looping when
    long enough), every 7th conv's tool turns become tracebacks
    (→ tool_failure unless looping wins precedence), conversations
    naturally ending on a user turn → abandoned, rest completed."""
    from threat_intelligence_knowledge_graph_spark.operators.transcript_stats import (
        conversation_outcomes,
    )

    tr = _synth_transcripts(spark, sf_dir)
    key = F.col("conv_id").cast("long")
    planted = tr.withColumn(
        "text",
        F.when(
            (key % 11 == 0) & F.col("turn_idx").between(3, 5),
            F.lit("retrying tool call"),
        )
        .when(
            (key % 7 == 0) & (F.col("role") == "tool"),
            F.lit("Traceback: tool exploded"),
        )
        .otherwise(F.col("text")),
    )
    return conversation_outcomes(planted, min_run=3)


def q_graph_assortativity(spark, sf_dir):
    """Degree assortativity over the planted 3-clique+pendant gadgets:
    identical disjoint gadgets make the coefficient analytic and
    gadget-count-invariant (r = -20/28 = -0.714286 — the hub-to-leaf
    C2-star signature). Exact bigint sums, ONE round-6 division."""
    from threat_intelligence_knowledge_graph_spark.operators.graph_algos import (
        degree_assortativity,
    )

    return degree_assortativity(_triangle_gadget_edges(spark, sf_dir))


def _gopher_corpus(spark, sf_dir):
    """Documents with one planted failure per Gopher rule (first
    matching plant wins): %7 3-word shorts, %11 hash-prefixed, %13
    digit-only words, %17 no-stopword prose, %19 one-char words, %3
    bullet-heavy, %5 ellipsis-terminated."""
    d = _t(spark, sf_dir, "documents")
    k = F.col("doc_id")
    return d.select(
        "doc_id",
        F.when(k % 7 == 0, F.lit("tiny doc only"))
        .when(k % 11 == 0, F.concat(F.lit("#### ## "), F.col("text")))
        .when(k % 13 == 0, F.repeat(F.lit("111 "), 60))
        .when(k % 17 == 0, F.repeat(F.lit("zap "), 60))
        .when(k % 19 == 0, F.repeat(F.lit("a "), 60))
        .when(k % 3 == 0, F.concat(F.lit("- a\n- b\n- c\n"), F.col("text")))
        .when(k % 5 == 0, F.concat(F.col("text"), F.lit("...")))
        .otherwise(F.col("text"))
        .alias("text"),
    )


def q_gopher_rules(spark, sf_dir):
    """Gopher quality rules (Rae et al. 2021) verdict frame over the
    rule-planted corpus: fixed precedence word_count → mean_word_len →
    symbol_ratio → bullet_lines → ellipsis_lines → alpha_words →
    stopwords; exact int/int ratios, round-6 reported columns.
    Thresholds tuned to the corpus (min_words=10, bullet 0.5,
    min_stopwords=1) so every rule bites."""
    from threat_intelligence_knowledge_graph_spark.operators.text_quality import (
        gopher_rules,
    )

    return gopher_rules(
        _gopher_corpus(spark, sf_dir),
        min_words=10,
        max_bullet_frac=0.5,
        min_stopwords=1,
    )


def q_stix_objects(spark, sf_dir):
    """STIX 2.1 SDO/SCO skeleton export of the kernel's node set over
    the constructed CTI corpus: store label → STIX type, id =
    '<type>--<uuid-shaped md5(node_id)>' (deterministic content-derived
    ids, re-export-stable). Oracle: the analytic node-set SQL projected
    through the same CASE mapping + md5 formatting."""
    from threat_intelligence_knowledge_graph_spark.operators.stix_export import (
        stix_objects,
    )

    records = extract_graph_records(_cti_docs(spark, sf_dir))
    nodes = (
        records.filter(F.col("kind") == "node")
        .select("node_label", "node_id")
        .distinct()
    )
    return stix_objects(nodes)


def q_stix_relationships(spark, sf_dir):
    """STIX SRO export of the kernel's edge set (RESOLVES_TO /
    CONTAINS over the CTI corpus): relationship_type = store rel
    lowered with '_'→'-', refs derived exactly as q_stix_objects, SRO
    id hashes the full (src, rel, dst) identity."""
    from threat_intelligence_knowledge_graph_spark.operators.stix_export import (
        stix_relationships,
    )

    records = extract_graph_records(_cti_docs(spark, sf_dir))
    edges = (
        records.filter(F.col("kind") == "edge")
        .select("src_label", "src_id", "rel_type", "dst_label", "dst_id")
        .distinct()
    )
    return stix_relationships(edges)


def _cve_mention_rows(spark, sf_dir):
    """(value, conv_id) CVE mention feed over the CTI corpus."""
    docs = _cti_docs(spark, sf_dir)
    return docs.select(
        F.explode(
            F.regexp_extract_all("doc_text", F.lit(_CVE_RX), 0)
        ).alias("value"),
        "conv_id",
    )


def _cve_watchlist(spark, sf_dir):
    """Planted analyst watchlist: CVE-2017-0144 (mentioned everywhere)
    plus the century-spaced CVE-2021 grid — the high grid values exceed
    the corpus's orderkey range, so silent (0,0) watch rows exist."""
    o = _t(spark, sf_dir, "orders")
    grid = o.select(
        F.concat(
            F.lit("CVE-2021-"),
            ((F.col("o_orderkey") % 90) * 100 + 1000).cast("string"),
        ).alias("value")
    ).distinct()
    return grid.unionByName(
        o.limit(1).select(F.lit("CVE-2017-0144").alias("value"))
    )


def q_watchlist_alerts(spark, sf_dir):
    """Alert feed: (value, conv_id) rows for watched CVE mentions —
    mention stream inner-joined against the broadcast watchlist."""
    from threat_intelligence_knowledge_graph_spark.operators.alerts import (
        watchlist_alerts,
    )

    return watchlist_alerts(
        _cve_mention_rows(spark, sf_dir), _cve_watchlist(spark, sf_dir)
    ).distinct()


def q_watchlist_summary(spark, sf_dir):
    """Per-watched-value rollup INCLUDING silent entries: watched CVEs
    with no mention report (0, 0) — silence is signal."""
    from threat_intelligence_knowledge_graph_spark.operators.alerts import (
        watchlist_summary,
    )

    return watchlist_summary(
        _cve_mention_rows(spark, sf_dir), _cve_watchlist(spark, sf_dir)
    )


def _mmr_vectors(spark, sf_dir):
    """(vec_id, embedding): dim-8 Pythagorean-direction vectors
    s·[x_d, y_d, 0…] with (x_d, y_d) ∈ {(1,0), (4,3), (3,4), (0,1)} by
    key%4 and integer scale s = key%3+1, one vector per 199th orderkey.
    Norms are perfect squares (5s or s), so every query and pairwise
    cosine is ONE correctly-rounded division of exact integers —
    bit-identical in any engine and under either cosine formula
    (dot/(na·nb) ≡ dot/sqrt(sa·sb) when all operands are exact)."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 199 == 0)
    k = F.col("o_orderkey")
    s = (k % 3 + 1).cast("double")
    d = k % 4
    x = (
        F.when(d == 0, 1.0).when(d == 1, 4.0).when(d == 2, 3.0).otherwise(0.0)
    )
    y = (
        F.when(d == 0, 0.0).when(d == 1, 3.0).when(d == 2, 4.0).otherwise(1.0)
    )
    return o.select(
        k.alias("vec_id"),
        F.array(s * x, s * y, *[F.lit(0.0)] * 6).alias("embedding"),
    )


def q_similarity_mmr(spark, sf_dir):
    """MMR diversity re-ranking (lam=0.3, k=4) over the Pythagorean
    direction corpus: the greedy trace is exact-arithmetic (query
    cosines 1.0/0.8/0.6/0.0, pairwise 0.96/0.8/0.6), so redundant
    same-direction picks lose to fresh directions deterministically.
    Oracle: the pool CTE + four unrolled argmax steps, each scoring
    lam·cos − (1−lam)·max-cos-to-selected with identical literals."""
    from threat_intelligence_knowledge_graph_spark.operators.similarity import (
        mmr_rerank,
    )

    return mmr_rerank(
        _mmr_vectors(spark, sf_dir), _QVEC8, k=4, lam=0.3, pool=50
    ).select(
        "rank",
        "vec_id",
        F.round("cosine", 6).alias("cosine"),
        F.round("mmr_score", 6).alias("mmr_score"),
    )


def q_corpus_fertility(spark, sf_dir):
    """Per-source tokenizer-fertility diagnostic over documents: exact
    bigint char/BPE-token sums, two round-6 divisions."""
    from threat_intelligence_knowledge_graph_spark.operators.text_quality import (
        corpus_fertility,
    )

    return corpus_fertility(_t(spark, sf_dir, "documents"))


def q_dedup_family_sizes(spark, sf_dir):
    """Exact-duplicate family-size histogram over documents with
    planted replay families (every 7th doc replayed twice → size-3
    families, every 13th once → size-2, %91 docs → size-4): md5
    content classes → size → histogram, two cascaded integer
    aggregates, only hashes shuffle."""
    from threat_intelligence_knowledge_graph_spark.operators.dedup import (
        family_size_histogram,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    k = F.col("doc_id")
    corpus = (
        d.unionByName(d.filter(k % 7 == 0))
        .unionByName(d.filter(k % 7 == 0))
        .unionByName(d.filter(k % 13 == 0))
    )
    return family_size_histogram(corpus)


def _conv_dedup_corpus(spark, sf_dir):
    """Synthetic transcripts + planted duplicate families: every 13th
    conversation replayed byte-identically under a fresh key (_dup),
    every 17th replayed with turn 1 edited (_near — a retry loop).
    Unrelated conversations share no turn text (it embeds the conv
    key), so the dedup families are analytically exact."""
    tr = _synth_transcripts(spark, sf_dir)
    key = F.col("conv_id").cast("long")
    dups = tr.filter(key % 13 == 0).withColumn(
        "conv_id", F.concat(F.col("conv_id"), F.lit("_dup"))
    )
    near = (
        tr.filter(key % 17 == 0)
        .withColumn(
            "text",
            F.when(
                F.col("turn_idx") == 1,
                F.concat(F.lit("RETRY "), F.col("text")),
            ).otherwise(F.col("text")),
        )
        .withColumn("conv_id", F.concat(F.col("conv_id"), F.lit("_near")))
    )
    return tr.unionByName(dups).unionByName(near)


def q_conv_dedup_exact(spark, sf_dir):
    """Conversation-level exact dedup: order-preserving role␟text
    fingerprint + min-id canonical assignment. The planted _dup
    replays must collapse onto their originals; _near copies (one
    edited turn) must NOT."""
    from threat_intelligence_knowledge_graph_spark.operators.conv_dedup import (
        conversation_dedup_exact,
    )

    return conversation_dedup_exact(_conv_dedup_corpus(spark, sf_dir))


def q_conv_near_dup(spark, sf_dir):
    """Conversation near-dup pairs by turn-set Jaccard ≥ 0.6 via the
    exact inverted-index join: _dup replays pair at 1.0, _near retries
    at (n−1)/(n+1) — detected for n ≥ 4, correctly below threshold for
    shorter conversations."""
    from threat_intelligence_knowledge_graph_spark.operators.conv_dedup import (
        conversation_near_dup,
    )

    return conversation_near_dup(_conv_dedup_corpus(spark, sf_dir), 0.6)


def q_sft_pairs(spark, sf_dir):
    """SFT training-pair mining: every user turn immediately followed
    by an assistant turn (turn_idx order) over the synthetic
    transcripts — the downstream surface a transcript corpus feeds.
    One conv_id exchange; lead() windows share the sort."""
    from threat_intelligence_knowledge_graph_spark.operators.sft import (
        sft_pairs,
    )

    return sft_pairs(_synth_transcripts(spark, sf_dir))


def q_validate_traces(spark, sf_dir):
    """Per-conversation structural validation (role grammar, dense
    turn indexing, non-empty text) with the AND-fold is_valid flag —
    the quarantine gate before SFT-pair mining. The irregular synthetic
    role pattern exercises every check both ways."""
    from threat_intelligence_knowledge_graph_spark.operators.sft import (
        validate_traces,
    )

    return validate_traces(_synth_transcripts(spark, sf_dir))


def q_semantic_dedup(spark, sf_dir):
    """SemDeDup (cluster-then-dedup): the embeddings table augmented
    with an exact copy of every 7th row (vec_id + 100000 — each copy
    pairs with its original at cosine exactly 1.0 and, having identical
    quantized components, lands in the same k-means cluster), then
    integer-exact k-means (k=4, 2 rounds) and per-pair greedy min-id
    blocking at rounded cosine ≥ 0.95 within each cluster. The oracle
    recomputes the identical algorithm (unrolled Lloyd CTEs + EXISTS
    blocking), so output equality is exact, not analytic."""
    from threat_intelligence_knowledge_graph_spark.operators.clustering import (
        semantic_dedup,
    )

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    dups = emb.filter(F.col("vec_id") % 7 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    return semantic_dedup(
        emb.unionByName(dups), k=4, iterations=2, scale=1024, threshold=0.95
    )


def q_hll_distinct_users(spark, sf_dir):
    """HyperLogLog sketch (p=6, 64 registers) over events.user_id:
    fixed-size distinct-count state that merges by registerwise max —
    the per-partition/per-day cube shape KMV's k-row sketch doesn't
    give. The md5 hash family, register routing, leading-1 ranks, and
    the SCALED-INTEGER harmonic sum (2^(59-M) terms, exact in
    decimal/HUGEINT) are all integer-exact cross-engine; the single
    float op is the final division, identical in both."""
    from threat_intelligence_knowledge_graph_spark.operators.sketches import (
        hll_build,
        hll_estimate,
    )

    ev = _t(spark, sf_dir, "events").select("user_id")
    return hll_estimate(hll_build(ev, "user_id", p=6), p=6)


def q_embedding_decontaminate(spark, sf_dir):
    """Embedding-space benchmark decontamination (the n-gram check's
    paraphrase-catching sibling): every 83rd embedding plays the eval
    set, BROADCAST against one corpus scan; each corpus row reports its
    nearest eval item by rounded cosine (eval-id tiebreak) and whether
    it crosses 0.99 — the planted eval rows flag themselves (cos 1.0),
    everything else reports its measured neighbor."""
    from threat_intelligence_knowledge_graph_spark.operators.decontaminate import (
        embedding_decontaminate,
    )

    emb = _t(spark, sf_dir, "embeddings")
    evals = emb.filter(F.col("vec_id") % 83 == 0).select(
        F.col("vec_id").alias("eval_id"), "embedding"
    )
    return embedding_decontaminate(emb, evals, threshold=0.99)


def q_cypher_optional_match(spark, sf_dir):
    """Cypher-lite OPTIONAL MATCH: the required Domain scan keeps every
    row and the optional RESOLVES_TO hop LEFT-joins in — unresolved
    domains (the planted b{k} family has no RESOLVES_TO edge) surface
    with a NULL ip, exactly Neo4j's unmatched-optional semantics. The
    oracle replays the planted-graph construction in SQL."""
    from threat_intelligence_knowledge_graph_spark.plans.cypher_lite import (
        cypher_query,
    )

    nodes, edges = _cypher_graph(spark, sf_dir)
    return cypher_query(
        spark,
        "MATCH (d:Domain) OPTIONAL MATCH (d)-[r:RESOLVES_TO]->(i:Ipv4) "
        "RETURN d.name AS domain, i AS ip",
        nodes=nodes,
        edges=edges,
    )


def q_cypher_var_length(spark, sf_dir):
    """Cypher-lite bounded variable-length hop: (m:Malware)-[*1..2]->(x)
    over the planted graph — one row per relationship-unique path
    (len 1: both COMMUNICATES_WITH domains; len 2: the ip reached via
    a{k}'s RESOLVES_TO). The oracle enumerates the planted paths
    analytically."""
    from threat_intelligence_knowledge_graph_spark.plans.cypher_lite import (
        cypher_query,
    )

    nodes, edges = _cypher_graph(spark, sf_dir)
    return cypher_query(
        spark,
        "MATCH (m:Malware)-[*1..2]->(x) RETURN m.name AS mal, x AS target",
        nodes=nodes,
        edges=edges,
    )


def q_events_anomaly(spark, sf_dir):
    """Top-20 group-relative z-score outliers over the event log (per
    event_type population moments, broadcast back, scan-local scoring).
    z is ROUNDED to 3 before ranking and tie-broken by event_id, so the
    rank set is engine-deterministic despite ~1e-12 variance-
    accumulation differences between engines."""
    from threat_intelligence_knowledge_graph_spark.operators.anomaly import (
        zscore_outliers,
    )

    return zscore_outliers(_t(spark, sf_dir, "events"), k=20)


def q_similarity_sq_topk(spark, sf_dir):
    """int8 scalar-quantization ANN (FAISS SQ8 analog): integer-dot
    candidate scoring over clamp(floor(x·127/s + 0.5)) vectors (s =
    corpus max |component| — an order-free max, engine-exact), top-40
    candidates by (int score DESC, id), exact cosine rerank to top-10.
    Every step is exactly-rounded IEEE or integer arithmetic, so the
    candidate set AND the final ranking match the oracle exactly."""
    from threat_intelligence_knowledge_graph_spark.operators.similarity import (
        sq_topk,
    )

    emb = _t(spark, sf_dir, "embeddings")
    qvec = [float(x) for x in emb.filter("vec_id = 0").first()["embedding"]]
    return sq_topk(emb, qvec, k=10, rerank_factor=4)


def _louvain_barbell_edges(spark, sf_dir):
    """Planted Louvain barbell from `nation`: two 12-cliques (keys
    0-11, 12-23) joined by the single bridge n11—n12 — shared by
    q_graph_louvain and q_graph_modularity (the oracle side shares the
    same way via _louvain_oracle_sql)."""
    nat = (
        _t(spark, sf_dir, "nation")
        .select(F.col("n_nationkey").alias("k"))
        .filter(F.col("k") < 24)
    )
    a, b = nat.alias("a"), nat.alias("b")
    cliques = a.join(
        b,
        (F.col("a.k") < F.col("b.k"))
        & (F.floor(F.col("a.k") / 12) == F.floor(F.col("b.k") / 12)),
    ).select(
        F.concat(F.lit("n"), F.col("a.k").cast("string")).alias("src"),
        F.concat(F.lit("n"), F.col("b.k").cast("string")).alias("dst"),
    )
    bridge = nat.filter(F.col("k") == 11).select(
        F.lit("n11").alias("src"), F.lit("n12").alias("dst")
    )
    return cliques.union(bridge)


def q_graph_louvain(spark, sf_dir):
    """Synchronous Louvain-style modularity communities (GDS
    gds.louvain's local-move phase, 4 directional-alternation rounds)
    over the planted nation barbell (_louvain_barbell_edges). Every
    score is integer arithmetic + one exactly-rounded division, and
    the move gating is a pure function of round parity, so the DuckDB
    oracle unrolls the identical recurrence (operators/louvain.py)."""
    from threat_intelligence_knowledge_graph_spark.operators.louvain import (
        louvain_communities,
    )

    return louvain_communities(_louvain_barbell_edges(spark, sf_dir), iterations=4)


def q_graph_louvain_weighted(spark, sf_dir):
    """Weighted synchronous Louvain (GDS relationshipWeightProperty
    semantics: kin/degree/volume/2m are weight sums) over the nation
    barbell with planted integer weights — (a.k+b.k)%3+1 on clique
    edges, 7 on the n11—n12 bridge, heavy enough that the bridge
    endpoints move differently than in the unweighted entry. Integer
    weights keep every score float-exact, so the oracle unrolls the
    identical weighted recurrence."""
    from threat_intelligence_knowledge_graph_spark.operators.louvain import (
        louvain_communities,
    )

    nat = (
        _t(spark, sf_dir, "nation")
        .select(F.col("n_nationkey").alias("k"))
        .filter(F.col("k") < 24)
    )
    a, b = nat.alias("a"), nat.alias("b")
    cliques = a.join(
        b,
        (F.col("a.k") < F.col("b.k"))
        & (F.floor(F.col("a.k") / 12) == F.floor(F.col("b.k") / 12)),
    ).select(
        F.concat(F.lit("n"), F.col("a.k").cast("string")).alias("src"),
        F.concat(F.lit("n"), F.col("b.k").cast("string")).alias("dst"),
        ((F.col("a.k") + F.col("b.k")) % 3 + 1).cast("double").alias("w"),
    )
    bridge = nat.filter(F.col("k") == 11).select(
        F.lit("n11").alias("src"),
        F.lit("n12").alias("dst"),
        F.lit(7.0).alias("w"),
    )
    return louvain_communities(
        cliques.unionByName(bridge), iterations=4, weight="w"
    )


def q_graph_modularity(spark, sf_dir):
    """Newman modularity Q of the 4-round Louvain partition on the
    planted nation barbell (see q_graph_louvain) — the partition-
    quality gauge (GDS modularity analog). One row; converged barbell
    partition gives Q just under 0.5. Oracle: the same unrolled
    recurrence with the Q tail (integer counts + exactly-rounded
    double ops, rounded to 9)."""
    from threat_intelligence_knowledge_graph_spark.operators.louvain import (
        louvain_communities,
        modularity,
    )

    edges = _louvain_barbell_edges(spark, sf_dir)
    part = louvain_communities(edges, iterations=4)
    return modularity(edges, part)


def q_dedup_exact_docs(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.md5("text").alias("content_hash"))
        .groupBy("content_hash")
        .agg(F.count("*").alias("n_copies"), F.min("doc_id").alias("keep_id"))
    )


def q_dedup_bow(spark, sf_dir):
    """Order-insensitive bag-of-words dedup: families whose sorted
    token multisets are identical (catches word-reordered spins that
    byte-exact dedup misses); md5 fingerprint, min-id survivor. The
    base corpus has no reorderings (dedup_bow would be vacuously
    empty), so every 20th doc gets a deterministic token-REVERSED twin
    planted at doc_id + 10^12 — far above any real doc_id at every
    shipped SF (the offset must exceed max(doc_id), or twin ids would
    collide with real docs and corrupt keep_id) — same bag, different
    byte string — and each planted pair must come back as one family
    with the original id surviving."""
    from threat_intelligence_knowledge_graph_spark.operators.dedup import (
        bow_duplicates,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    twins = d.filter(F.col("doc_id") % 20 == 0).select(
        (F.col("doc_id") + F.lit(1_000_000_000_000)).alias("doc_id"),
        F.concat_ws(
            " ",
            F.reverse(
                F.expr("regexp_extract_all(lower(text), '[a-z0-9]{2,}', 0)")
            ),
        ).alias("text"),
    )
    return bow_duplicates(d.unionByName(twins))


def q_jaccard_prefix_join(spark, sf_dir):
    """Exact all-pairs token-set Jaccard >= 0.9 via the AllPairs/PPJoin
    prefix filter (rarest-token join keys + length filter). The oracle
    is an INDEPENDENT brute-force all-pairs join — the prefix filter's
    no-false-negative theorem is what makes the two methods agree."""
    from threat_intelligence_knowledge_graph_spark.operators.dedup import (
        prefix_filter_pairs,
    )

    return prefix_filter_pairs(_t(spark, sf_dir, "documents"), tau=0.9)


def q_events_json_props(spark, sf_dir):
    """Semi-structured path extraction: parse the events.props JSON
    column in-plan (Catalyst GetJsonObject — no Python, no UDF) and
    aggregate the extracted field per event type. The JSON-path probe
    of the relational surface: rows whose props lack the key, are
    NULL, or whose k is not a plain integer literal drop out via an
    explicit integer-regex gate BEFORE the cast — never an ANSI cast
    error on Spark, and never DuckDB's cast('1.5' AS bigint)=2
    rounding divergence."""
    e = _t(spark, sf_dir, "events")
    ks = F.get_json_object(F.col("props"), "$.k")
    return (
        e.select("event_type", ks.alias("_ks"))
        .filter(F.col("_ks").rlike("^-?[0-9]+$"))
        .select("event_type", F.col("_ks").cast("bigint").alias("_k"))
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("_k").cast("long").alias("sum_k"),
            F.round(F.avg("_k"), 6).alias("avg_k"),
            F.countDistinct("_k").cast("long").alias("n_distinct_k"),
        )
    )


def q_search_ndcg(spark, sf_dir):
    """NDCG@10 of the BM25 ranking for the pinned {merge, stream,
    vector} query against graded relevance rel(d) = number of distinct
    query terms present in d (0..3) — the ranking-quality member of
    the evaluation family; both sums bounded by k, no global sort."""
    from threat_intelligence_knowledge_graph_spark.operators.retrieval import (
        ndcg_eval,
    )
    from threat_intelligence_knowledge_graph_spark.operators.text_quality import (
        bm25_search,
    )

    d = _t(spark, sf_dir, "documents")
    terms = ["merge", "stream", "vector"]
    ranking = bm25_search(d, terms, k=10)
    toks = F.expr("regexp_extract_all(lower(text), '[a-z0-9]{2,}', 0)")
    rel = d.select(
        "doc_id",
        sum(
            F.array_contains(toks, t).cast("int") for t in terms
        ).alias("rel"),
    )
    return ndcg_eval(ranking, rel, k=10)


def q_events_benford(spark, sf_dir):
    """Benford first-significant-digit chi-square per event type — the
    volume-tamper screen; exact fixed-point digit extraction (no float
    log10), absent-digit-safe chi2 identity, round-6 post-sum."""
    from threat_intelligence_knowledge_graph_spark.operators.stats import (
        benford_deviation,
    )

    return benford_deviation(_t(spark, sf_dir, "events"))


def q_curriculum_order(spark, sf_dir):
    """Curriculum bucketing: token-count difficulty staged into 4
    buckets via deterministic-sample nearest-rank boundaries (the
    TeraSort range-boundary shape, md5-drawn sample)."""
    from threat_intelligence_knowledge_graph_spark.operators.packing import (
        curriculum_order,
    )

    return curriculum_order(_t(spark, sf_dir, "documents"))


def q_text_token_counts(spark, sf_dir):
    return token_counts(_t(spark, sf_dir, "documents"))


def q_text_quality_score(spark, sf_dir):
    return quality_score(_t(spark, sf_dir, "documents"))


def q_text_language_id(spark, sf_dir):
    return language_id(_t(spark, sf_dir, "documents"))


def q_text_fingerprints(spark, sf_dir):
    return fingerprints(_t(spark, sf_dir, "documents")).select(
        "doc_id", F.concat_ws(",", "fingerprint").alias("fp")
    )


def q_text_tfidf_top_terms(spark, sf_dir):
    """Top-5 characteristic terms per document by smoothed TF-IDF.
    Score rounded to 6 decimals BEFORE ranking; ranking key
    (tfidf DESC, df ASC, term ASC) is fully deterministic — see
    operators/text_quality.py::tfidf_top_terms."""
    return tfidf_top_terms(_t(spark, sf_dir, "documents"), k=5)


def q_events_type_cooccurrence(spark, sf_dir):
    """Behavioral co-occurrence edges from the event log: event types
    fired by the same user within the same hour, weight = #shared
    (user, hour) contexts — KG edge construction from observations
    (operators/graph_algos.py::cooccurrence_edges)."""
    from threat_intelligence_knowledge_graph_spark.operators.graph_algos import (
        cooccurrence_edges,
    )

    e = _t(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("hour", "ts").alias("hr"), "event_type"
    )
    return cooccurrence_edges(e, "event_type", ["user_id", "hr"])


def q_similarity_topk(spark, sf_dir):
    from threat_intelligence_knowledge_graph_spark.operators.similarity import (
        with_cosine,
    )

    emb = _t(spark, sf_dir, "embeddings")
    qvec = [float(x) for x in emb.filter("vec_id = 0").first()["embedding"]]
    return (
        with_cosine(emb, qvec)
        .select("vec_id", F.round("cosine", 3).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col("vec_id"))
        .limit(10)
    )


def q_set_ops_nations(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    both = c.intersect(s).select(F.lit("both").alias("src"), "nationkey")
    cust_only = c.subtract(s).select(  # EXCEPT DISTINCT semantics
        F.lit("customer_only").alias("src"), "nationkey"
    )
    return both.unionByName(cust_only)


def q_rollup_orders(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderpriority", "o_orderstatus")
        .agg(F.count("*").alias("n"))
        .select(
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            "n",
        )
    )


def q_pivot_order_status(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias("n_f"),
        F.sum(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0)).alias("n_o"),
        F.sum(F.when(F.col("o_orderstatus") == "P", 1).otherwise(0)).alias("n_p"),
    )


def q_anti_join_orders(spark, sf_dir):
    """Orders with no lineitems (left-anti; ~1.7% of orders)."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left_anti")
        .select("o_orderkey", "o_orderstatus")
    )


def q_events_hourly(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_trunc("hour", F.col("ts").cast("timestamp")).alias("hour"),
            "event_type",
        )
        .agg(F.count("*").alias("n"))
    )


def q_events_percentiles(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(value, 0.95)"), 4).alias("p95"),
        F.round(F.min("value"), 4).alias("vmin"),
        F.round(F.max("value"), 4).alias("vmax"),
    )


def q_similarity_batch_topk(spark, sf_dir):
    """ANN JOIN: exact cosine top-5 over the corpus for every query
    vector (every 97th embedding) in one plan — broadcast probe set,
    per-query window rank on the ROUNDED cosine so top-k membership is
    engine-portable."""
    from threat_intelligence_knowledge_graph_spark.operators.similarity import (
        batch_topk,
    )

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 97 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return batch_topk(emb, queries, k=5)


def q_hard_negatives(spark, sf_dir):
    """Contrastive-training hard negatives: for each labeled (query,
    positive) pair (query = every 97th embedding, positive = the next
    vec_id), the top-3 highest-cosine corpus vectors excluding both
    pair members — broadcast probe set, one corpus scan, per-pair
    window rank on the rounded cosine."""
    from threat_intelligence_knowledge_graph_spark.operators.similarity import (
        hard_negatives,
    )

    emb = _t(spark, sf_dir, "embeddings")
    pairs = (
        emb.filter(F.col("vec_id") % 97 == 0)
        .select(F.col("vec_id").alias("query_id"))
        .join(
            emb.select((F.col("vec_id") - 1).alias("query_id"),
                       F.col("vec_id").alias("pos_id")),
            "query_id",
        )
    )
    return hard_negatives(emb, pairs, k=3)


def q_events_extremes(spark, sf_dir):
    """Monitoring-style outlier surfacing: the K most extreme values per
    event_type in each direction, by exact rank (value, event_id tie
    break) — integer ranks, no float-boundary compares, so the oracle
    is bit-exact by construction. One row PER DIRECTION MEMBERSHIP: in
    a group smaller than 2K a row can be both a top-K and a bottom-K
    value and appears twice (a single-label row would silently
    under-report one side — review finding r4)."""
    from pyspark.sql.window import Window

    e = _t(spark, sf_dir, "events")
    hi = Window.partitionBy("event_type").orderBy(
        F.desc("value"), F.asc("event_id")
    )
    lo = Window.partitionBy("event_type").orderBy(
        F.asc("value"), F.asc("event_id")
    )
    k = 20
    ranked = e.withColumn("_rh", F.row_number().over(hi)).withColumn(
        "_rl", F.row_number().over(lo)
    )
    cols = ["event_id", "event_type", F.round("value", 4).alias("value")]
    return (
        ranked.filter(F.col("_rh") <= k)
        .select(*cols, F.lit("high").alias("direction"))
        .unionByName(
            ranked.filter(F.col("_rl") <= k).select(
                *cols, F.lit("low").alias("direction")
            )
        )
    )


def q_latest_event_per_user(spark, sf_dir):
    e = _t(spark, sf_dir, "events").alias("e")
    last = (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.max("ts").alias("last_ts"))
        .alias("l")
    )
    return (
        e.join(
            last,
            (F.col("e.user_id") == F.col("l.user_id"))
            & (F.col("e.ts") == F.col("l.last_ts")),
        )
        .groupBy(F.col("l.user_id").alias("user_id"), F.col("l.last_ts"))
        .agg(F.min("event_id").alias("event_id"))  # deterministic tie-break
        .select("user_id", "event_id")
    )


def q_asof_join_events_orders(spark, sf_dir):
    """Point-in-time enrichment: every event gets the customer's most
    recent order at-or-before the event timestamp (ties on o_orderdate
    broken by max o_orderkey on both engines). Union-merge plan: one
    Exchange on the key, no range-join blowup."""
    from threat_intelligence_knowledge_graph_spark.operators.temporal_join import (
        asof_join,
    )

    out = asof_join(
        _t(spark, sf_dir, "events"),
        _t(spark, sf_dir, "orders"),
        left_key="user_id",
        right_key="o_custkey",
        left_time="ts",
        right_time="o_orderdate",
        right_cols=["o_orderkey", "o_totalprice"],
        tie_break="o_orderkey",
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.col("asof_o_orderkey").alias("asof_orderkey"),
        F.round("asof_o_totalprice", 4).alias("asof_totalprice"),
    )


def q_interval_join_events(spark, sf_dir):
    """Keyless range join: events against planted 2-day incident
    windows (derived from o_orderkey inside the events' time range on
    BOTH engines), aggregated per window. The bucketized equi-join
    replaces the cartesian inequality join; the oracle runs DuckDB's
    native inequality join — an independent plan for the same
    semantics."""
    from threat_intelligence_knowledge_graph_spark.operators.temporal_join import (
        interval_join,
    )

    wins = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 40 == 0)
        .select(
            F.col("o_orderkey").alias("window_id"),
            F.expr(
                "timestamp '2024-01-01 00:00:00' + make_interval(0, 0, 0,"
                " cast(o_orderkey % 28 as int),"
                " cast(o_orderkey % 24 as int), 0, 0)"
            ).alias("ws"),
        )
        .withColumn("we", F.expr("ws + INTERVAL 2 DAYS"))
    )
    joined = interval_join(
        _t(spark, sf_dir, "events"),
        wins,
        fact_time="ts",
        win_start="ws",
        win_end="we",
        bucket_seconds=86400,
        broadcast_windows=True,
    )
    return joined.groupBy("window_id").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
        F.min("event_id").alias("first_event"),
        F.max("event_id").alias("last_event"),
    )


# --- dedup / ANN entries over PLANTED corpora -------------------------------
# The sf tables carry random text/vectors, where approximate operators'
# outputs aren't SQL-predictable. These entries plant deterministic
# near-duplicates (derived from o_orderkey on BOTH sides) chosen so the
# approximate operator provably returns the exact answer:
# - identical shingle sets / identical directions ⇒ identical LSH
#   signatures in every band ⇒ candidacy is guaranteed, not probabilistic;
# - all other cosines/jaccards sit far below the threshold ⇒ exact
#   verification removes any chance collisions.
# The DuckDB oracle then computes the expected set independently (full
# brute-force pair join / exact top-k), making each entry an
# "approximate == exact on this corpus" equivalence check.

def _planted_near_dup_docs(spark, sf_dir, every: int | None = None):
    """Two docs per orderkey: cyclic 4-word texts repeated 5× and 7×.

    Same word cycle ⇒ identical word-3-shingle sets ⇒ jaccard exactly 1.0
    and guaranteed LSH candidacy. For o_orderkey % 3 == 0 the second doc
    swaps the 4th word, dropping jaccard to 1/7 — a below-threshold
    family the verifier must exclude. ``every`` keeps only orderkeys
    divisible by it (smaller corpora for O(n²) oracles)."""
    o = _t(spark, sf_dir, "orders")
    if every is not None:
        o = o.filter(F.col("o_orderkey") % every == 0)
    pairs = o.select(
        F.col("o_orderkey").alias("k"),
        F.explode(F.array(F.lit(0), F.lit(1))).alias("j"),
    )
    ks = F.col("k").cast("string")
    w = lambda p: F.concat(F.lit(p), ks)  # noqa: E731
    last = F.when(
        (F.col("j") == 1) & (F.col("k") % 3 == 0), w("we")
    ).otherwise(w("wd"))
    base = F.concat_ws(" ", w("wa"), w("wb"), w("wc"), last)
    text = F.array_join(F.array_repeat(base, (F.lit(5) + F.col("j") * 2).cast("int")), " ")
    return pairs.select(
        (F.col("k") * 2 + F.col("j")).alias("doc_id"), text.alias("text")
    )


def q_minhash_near_dup_docs(spark, sf_dir):
    docs = _planted_near_dup_docs(spark, sf_dir)
    return minhash_near_duplicates(docs, jaccard_threshold=0.8).select(
        "a", "b", F.round("jaccard", 4).alias("jaccard")
    )


def q_ngram_jaccard(spark, sf_dir):
    """LSH-prefiltered EXACT n-gram Jaccard on the planted corpus.
    Identical word cycles share their full 4-shingle set (jaccard 1.0,
    guaranteed LSH candidacy via identical signatures); the swapped
    families intersect in exactly 1 of 7 shingles (1/7 < 0.5 excluded) —
    so the expected pair set is analytic."""
    from threat_intelligence_knowledge_graph_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    docs = _planted_near_dup_docs(spark, sf_dir)
    return ngram_jaccard_pairs(docs, threshold=0.5).select(
        "a", "b", F.round("jaccard", 4).alias("jaccard")
    )


def _planted_containment_docs(spark, sf_dir):
    """Two docs per orderkey: A = 6 k-suffixed words (4 distinct
    3-shingles), B = A's 6 words + 6 fresh x-words (10 shingles, all 4
    of A's among them) → C(A→B) = 4/4 = 1.0 while Jaccard is only
    4/10 — the asymmetric case. For o_orderkey % 3 == 0, B's copy of
    A's 4th word is swapped, leaving ONE shared shingle (< min_shared,
    and containment 1/4) — an analytically-excluded family. Vocab is
    k-suffixed, so no cross-gadget candidates exist."""
    o = _t(spark, sf_dir, "orders")
    pairs = o.select(
        F.col("o_orderkey").alias("k"),
        F.explode(F.array(F.lit(0), F.lit(1))).alias("j"),
    )
    ks = F.col("k").cast("string")
    w = lambda p: F.concat(F.lit(p), ks)  # noqa: E731
    a4 = F.when((F.col("j") == 1) & (F.col("k") % 3 == 0), w("we")).otherwise(
        w("wd")
    )
    prefix = F.concat_ws(" ", w("wa"), w("wb"), w("wc"), a4, w("wf"), w("wg"))
    suffix = F.concat_ws(" ", w("xa"), w("xb"), w("xc"), w("xd"), w("xe"), w("xf"))
    text = F.when(F.col("j") == 0, prefix).otherwise(
        F.concat_ws(" ", prefix, suffix)
    )
    return pairs.select(
        (F.col("k") * 2 + F.col("j")).alias("doc_id"), text.alias("text")
    )


def q_source_overlap(spark, sf_dir):
    """Cross-source exact-duplicate matrix over documents ∪ a planted
    'mirror' source that re-publishes every 7th doc verbatim: md5
    content identity, scan-side per-source distinct, ONE hash-keyed
    self-join, exact-integer shares (round-6)."""
    from threat_intelligence_knowledge_graph_spark.operators.dedup import (
        source_overlap,
    )

    d = _t(spark, sf_dir, "documents")
    mirror = (
        d.filter(F.col("doc_id") % 7 == 0)
        .select(F.lit("zz_mirror").alias("source"), "text")
    )
    return source_overlap(d.select("source", "text").unionByName(mirror))


def q_select_sources(spark, sf_dir):
    """Greedy set cover over documents ∪ a planted aggregator source
    (every 3rd doc from all sources — the biggest distinct set, so it
    wins round 1) ∪ a planted every-7th mirror: 4 rounds, exact-integer
    gains, (n DESC, source ASC) picks. Oracle: the greedy REPLAYED as
    4 unrolled CTE rounds."""
    from threat_intelligence_knowledge_graph_spark.operators.dedup import (
        select_sources_greedy,
    )

    d = _t(spark, sf_dir, "documents")
    agg = d.filter(F.col("doc_id") % 3 == 0).select(
        F.lit("zz_union").alias("source"), "text"
    )
    mirror = d.filter(F.col("doc_id") % 7 == 0).select(
        F.lit("zz_mirror").alias("source"), "text"
    )
    docs = d.select("source", "text").unionByName(agg).unionByName(mirror)
    return select_sources_greedy(docs, k=4)


def q_ngram_containment(spark, sf_dir):
    """Asymmetric n-gram containment over the planted quote-inclusion
    corpus: every small doc sits verbatim inside its big sibling
    (C(A→B) exactly 1.0, Jaccard only 0.4 — the pair symmetric dedup
    misses), the k%3==0 family shares one shingle only (excluded
    analytically by min_shared and threshold)."""
    from threat_intelligence_knowledge_graph_spark.operators.dedup import (
        containment_pairs,
    )

    docs = _planted_containment_docs(spark, sf_dir)
    pairs, _dropped = containment_pairs(docs, threshold=0.8)
    return pairs


def q_minhash_incremental(spark, sf_dir):
    """Incremental near-dup: even doc_ids are the existing corpus (only
    their persisted band-key index is reused — never re-shingled), odd
    doc_ids are the ingest batch. On the planted corpus every near-dup
    pair straddles old/new, so the incremental result must equal the
    full self-join entry's pair set (same oracle SQL)."""
    from threat_intelligence_knowledge_graph_spark.operators.dedup import (
        minhash_band_index,
        minhash_incremental_near_duplicates,
    )

    docs = _planted_near_dup_docs(spark, sf_dir)
    old = docs.filter(F.col("doc_id") % 2 == 0)
    new = docs.filter(F.col("doc_id") % 2 == 1)
    pairs, _new_idx, _dropped = minhash_incremental_near_duplicates(
        old, minhash_band_index(old), new, jaccard_threshold=0.8
    )
    return pairs.select("a", "b", F.round("jaccard", 4).alias("jaccard"))


def q_canonical_map(spark, sf_dir):
    """Stage-D alias canonicalization dictionary
    (operators/canonicalize.py::build_alias_dictionary): MinHash/LSH
    blocking over normalized surfaces → Jaccard verify → connected
    components → (node_id, canonical_id) for every non-canonical alias.

    Planted so the LSH outcome is ANALYTIC (the minhash_near_dup_docs
    soundness technique): every 7th orderkey seeds a family of 2-3
    CASE-variant ids ('GRP-…-X' / 'Grp-…-x' / 'grp-…-x') whose
    lowercased surfaces are IDENTICAL — identical shingle sets ⇒
    identical signatures ⇒ certain candidacy in every band ⇒ Jaccard
    exactly 1.0. Family keys are FULL 32-char md5 digests (NOT
    zero-padded integers: repeated-digit keys like 77 vs 777 have
    near-NESTED shingle sets, J = 15/16 — found the hard way; and not
    8-char prefixes, whose 32-bit space collides with ~5% probability
    already at sf0.1 key counts), so keys are unique at any SF and
    cross-family shingle Jaccard stays low — the 0.9 verify threshold
    rejects every cross-family candidate with wide margin. The
    dictionary is therefore exactly: family-min id canonicalizes the
    other members — which is what the DuckDB oracle computes without
    touching minhash."""
    from threat_intelligence_knowledge_graph_spark.operators.canonicalize import (
        build_alias_dictionary,
    )

    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 7 == 0)
    key = F.md5(F.col("o_orderkey").cast("string"))
    base = o.select(
        key.alias("k8"), (F.col("o_orderkey") % 2 == 0).alias("third")
    )
    variants = base.select(
        F.explode(
            F.when(
                F.col("third"),
                F.array(
                    F.concat(F.lit("GRP-"), F.col("k8"), F.lit("-X")),
                    F.concat(F.lit("Grp-"), F.col("k8"), F.lit("-x")),
                    F.concat(F.lit("grp-"), F.col("k8"), F.lit("-x")),
                ),
            ).otherwise(
                F.array(
                    F.concat(F.lit("GRP-"), F.col("k8"), F.lit("-X")),
                    F.concat(F.lit("Grp-"), F.col("k8"), F.lit("-x")),
                )
            )
        ).alias("node_id")
    ).select(F.lit("Group").alias("node_label"), "node_id")
    return build_alias_dictionary(variants, jaccard_threshold=0.9).orderBy(
        "node_id"
    )


def q_minhash_dedup_survivors(spark, sf_dir):
    """End-to-end near-dup dedup: exact pre-pass → LSH pairs → connected
    components → min-id survivor per cluster. On the planted corpus the
    expected keep-set is analytic: drop doc 2k+1 exactly when k%3 != 0
    (jaccard-1.0 families merge; the 1/7 families survive whole)."""
    from threat_intelligence_knowledge_graph_spark.operators.dedup import (
        minhash_dedup,
    )

    docs = _planted_near_dup_docs(spark, sf_dir)
    return minhash_dedup(docs, jaccard_threshold=0.8).select("doc_id")


def q_dedup_keep_best(spark, sf_dir):
    """Score-aware near-dup survivor selection on the planted corpus
    with score = (doc_id·7) mod 13: each jaccard-1.0 family {2k, 2k+1}
    keeps its argmax-score member (tie min id), the 1/7 families and
    all singletons survive whole — the expected keep-set is a CASE
    expression, analytic per orderkey."""
    from threat_intelligence_knowledge_graph_spark.operators.dedup import (
        dedup_keep_best,
    )

    docs = _planted_near_dup_docs(spark, sf_dir).withColumn(
        "score", (F.col("doc_id") * 7 % 13).cast("int")
    )
    return dedup_keep_best(docs, "score", jaccard_threshold=0.8).select(
        "doc_id", "score"
    )


def q_simhash_near_dups(spark, sf_dir):
    """SimHash near-dup PAIRS on a planted sub-corpus. Sound to oracle
    exactly: signatures are SQL-reproducible (md5 token hash) and the
    pigeonhole banding (max_hamming+1 bands) is deterministically
    COMPLETE — every pair within the distance budget must share a full
    band — so the operator's output equals the O(n²) brute-force SQL."""
    from threat_intelligence_knowledge_graph_spark.operators.dedup import (
        simhash_near_duplicates,
    )

    docs = _planted_near_dup_docs(spark, sf_dir, every=97)
    return simhash_near_duplicates(docs, max_hamming=3).select(
        "a", "b", F.col("hamming").cast("int").alias("hamming")
    )


def _planted_vectors(spark, sf_dir):
    """(vec_id, embedding): dim-8 vectors s·[1, t, 0…] with t = (key%50)/10
    and integer scale s ∈ {1,2,3}. The t=0 vectors are exact positive
    multiples of the query [1,0,…] — cosine exactly 1.0, same hyperplane
    signature and same IVF assignment as the query — so the approximate
    top-k provably equals the exact top-k."""
    o = _t(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    s = (k % 3 + 1).cast("double")
    t = (k % 50).cast("double") / F.lit(10.0)
    vec = F.array(s, s * t, *[F.lit(0.0)] * 6)
    return o.select(k.alias("vec_id"), vec.alias("embedding"))


_PLANTED_VECTORS_SQL = """
    SELECT o_orderkey AS vec_id,
           [cast(o_orderkey % 3 + 1 AS double),
            cast(o_orderkey % 3 + 1 AS double) * (cast(o_orderkey % 50 AS double) / 10.0),
            0.0, 0.0, 0.0, 0.0, 0.0, 0.0] AS emb
    FROM orders
"""

_QVEC8 = [1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]


def q_similarity_lsh_topk(spark, sf_dir):
    from threat_intelligence_knowledge_graph_spark.operators.similarity import lsh_topk

    emb = _planted_vectors(spark, sf_dir)
    return lsh_topk(emb, _QVEC8, k=10).select(
        "vec_id", F.round("cosine", 3).alias("cosine")
    )


def q_similarity_ivf_topk(spark, sf_dir):
    from threat_intelligence_knowledge_graph_spark.operators.similarity import (
        assign_centroids,
        ivf_topk,
        sample_centroids,
    )

    emb = _planted_vectors(spark, sf_dir)
    cents = sample_centroids(emb, 16)
    assigns = assign_centroids(emb, cents)
    return ivf_topk(emb, _QVEC8, cents, assigns, k=10).select(
        "vec_id", F.round("cosine", 3).alias("cosine")
    )


def q_embedding_near_dups(spark, sf_dir):
    """Planted dim-64 basis-direction vectors, two scales per orderkey
    multiple of 199: same-direction pairs have cosine exactly 1.0 (and
    identical signatures in every LSH band ⇒ guaranteed candidacy);
    cross-direction cosine is exactly 0. The oracle brute-forces all
    pairs, so LSH output must equal the exact pair set."""
    from threat_intelligence_knowledge_graph_spark.operators.similarity import (
        embedding_near_duplicates,
    )

    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 199 == 0)
    rows = o.select(
        F.col("o_orderkey").alias("k"),
        F.explode(F.array(F.lit(0), F.lit(1))).alias("j"),
    )
    idx = ((F.col("k") / 199).cast("long") % 64).cast("int")
    scale = (F.col("j") + 1).cast("double")
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(63)),
        lambda i: F.when(i == idx, scale).otherwise(F.lit(0.0)),
    )
    emb = rows.select(
        (F.col("k") * 2 + F.col("j")).alias("vec_id"), vec.alias("embedding")
    )
    return embedding_near_duplicates(emb, threshold=0.9, dim=64).select(
        "a", "b", F.round("cosine", 3).alias("cosine")
    )


def q_embedding_dedup_survivors(spark, sf_dir):
    """Embedding near-dup dedup end-to-end (banded LSH pairs → connected
    components → min-id survivor). On the planted basis vectors every
    same-direction family collapses to its min id — analytic keep-set."""
    from threat_intelligence_knowledge_graph_spark.operators.similarity import (
        embedding_dedup,
    )

    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 199 == 0)
    rows = o.select(
        F.col("o_orderkey").alias("k"),
        F.explode(F.array(F.lit(0), F.lit(1))).alias("j"),
    )
    idx = ((F.col("k") / 199).cast("long") % 64).cast("int")
    scale = (F.col("j") + 1).cast("double")
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(63)),
        lambda i: F.when(i == idx, scale).otherwise(F.lit(0.0)),
    )
    emb = rows.select(
        (F.col("k") * 2 + F.col("j")).alias("vec_id"), vec.alias("embedding")
    )
    return embedding_dedup(emb, threshold=0.9, dim=64).select("vec_id")


def q_simhash_signatures(spark, sf_dir):
    return simhash_signatures_df(_t(spark, sf_dir, "documents"))


def q_cms_join_size(spark, sf_dir):
    """Count-min inner-product join-cardinality estimate (the AMS/CM
    §4.2 estimator): |orders ⋈ customer| on custkey from two
    dimension-sized sketches — the decide-before-you-shuffle triage.
    Integer counts/products/sums, min over 3 hash rows; never below
    the true cardinality; bit-identical cross-engine."""
    from threat_intelligence_knowledge_graph_spark.operators.sketches import (
        cms_build,
        cms_join_size,
    )

    o = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("k")
    )
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k")
    )
    sa = cms_build(o, "k", depth=3, width=512, salt="cmsj")
    sb = cms_build(c, "k", depth=3, width=512, salt="cmsj")
    return cms_join_size(sa, sb, depth=3)


def q_quality_gate(spark, sf_dir):
    """Auto-calibrated per-source quality cut: keep documents at or
    above their own source's nearest-rank p25 quality (a fixed global
    threshold would gut whole heterogeneous sources). Threshold rows
    are the same physical picks on both engines (quality, id) order —
    the exact_percentiles discipline."""
    from threat_intelligence_knowledge_graph_spark.operators.text_quality import (
        quality_gate,
    )

    return quality_gate(_t(spark, sf_dir, "documents"), q=0.25)


def q_events_mad_outliers(spark, sf_dir):
    """Robust per-type outliers by modified z (median/MAD — Iglewicz &
    Hoaglin): both medians are nearest-rank picks with id tiebreak (the
    exact_percentiles discipline — both engines select the SAME
    physical rows), the z chain rounds to 6 before ranking, top-20 by
    (|z| DESC, id)."""
    from threat_intelligence_knowledge_graph_spark.operators.anomaly import (
        mad_outliers,
    )

    return mad_outliers(
        _t(spark, sf_dir, "events"),
        "value",
        "event_type",
        "event_id",
        threshold=2.0,
        k=20,
    )


def q_graph_conductance(spark, sf_dir):
    """Per-community conductance (GDS gds.conductance analog) of the
    ground-truth two-clique split over the planted nation barbell:
    each 12-clique has directed volume 12·11+1 = 133 and cut 1 (the
    bridge, once per direction on its own side) → φ = 1/133 exactly.
    Integer cut/volume arithmetic, one exactly-rounded division."""
    from threat_intelligence_knowledge_graph_spark.operators.louvain import (
        conductance,
    )

    e = _louvain_barbell_edges(spark, sf_dir)
    asg = (
        _t(spark, sf_dir, "nation")
        .filter(F.col("n_nationkey") < 24)
        .select(
            F.concat(F.lit("n"), F.col("n_nationkey").cast("string")).alias(
                "id"
            ),
            F.floor(F.col("n_nationkey") / 12).cast("long").alias("community"),
        )
    )
    return conductance(e, asg)


def q_corpus_kl(spark, sf_dir):
    """Domain-shift monitor: KL(src0-docs ‖ all-docs) between add-1-
    smoothed unigram distributions over the shared vocabulary — every
    ln argument a ratio of exact-integer products (the dsir
    discipline), round-6 after the global sum."""
    from threat_intelligence_knowledge_graph_spark.operators.text_quality import (
        unigram_kl,
    )

    docs = _t(spark, sf_dir, "documents")
    return unigram_kl(docs.filter(F.col("source") == "src0"), docs)


def q_events_retention(spark, sf_dir):
    """Cohort retention (indicator-lifetime triage: of entities first
    seen in bucket W, how many were active k buckets on) — daily
    buckets over the events timeline; epoch-integer bucketing, keyed
    min/join/distinct-count only."""
    from threat_intelligence_knowledge_graph_spark.operators.stats import (
        retention_cohorts,
    )

    return retention_cohorts(
        _t(spark, sf_dir, "events"), bucket_seconds=86400
    )


def q_events_funnel(spark, sf_dir):
    """Ordered funnel (kill-chain progression / signup→purchase→error):
    per user, step k counts only when it happens STRICTLY AFTER that
    user's step k−1 reach time (earliest valid completion — min over
    later events). Epoch-integer comparisons; per-step counts are
    bounded 1-long pulls; the oracle chains the identical min-after
    joins."""
    from threat_intelligence_knowledge_graph_spark.operators.stats import (
        funnel,
    )

    return funnel(
        _t(spark, sf_dir, "events"), ["signup", "purchase", "error"]
    )


def q_events_recency_decay(spark, sf_dir):
    """Exponential recency decay per event type (the "still-hot
    indicator" triage signal): each event contributes
    0.5^(age_days/3) anchored at the newest event in the frame (data-
    derived — no wall clock), so twice-today outranks 40-times-last-
    year. Epoch-integer age math; the pow sum rounds to 6 after the
    per-key agg (the dsir discipline)."""
    from threat_intelligence_knowledge_graph_spark.operators.anomaly import (
        recency_weighted_counts,
    )

    return recency_weighted_counts(
        _t(spark, sf_dir, "events"), "event_type", half_life_days=3.0
    )


def q_events_hist_quantiles(spark, sf_dir):
    """Mergeable fixed-bucket histogram quantiles (the order-statistics
    sketch completing KMV/CMS/HLL/Bloom): 64 buckets over value ∈
    [0, 200) — width 3.125 is exactly representable, so bucketing,
    cumulative integer counts, and the lower-bound quantile value are
    bit-identical cross-engine. q literals are cast to double in the
    oracle (DuckDB's decimal 0.95 · total would ceil differently from
    the IEEE product at exact-integer boundaries)."""
    from threat_intelligence_knowledge_graph_spark.operators.sketches import (
        hist_build,
        hist_quantiles,
    )

    sk = hist_build(
        _t(spark, sf_dir, "events"), "value", lo=0.0, hi=200.0, n_buckets=64
    )
    return hist_quantiles(sk, [0.5, 0.95], lo=0.0, hi=200.0, n_buckets=64)


def q_sft_pairs_context(spark, sf_dir):
    """Multi-turn SFT assembly: each mined (prompt, response) pair
    carries the conversation history before it, trimmed to the maximal
    contiguous MOST-RECENT suffix fitting 120 formatted chars (a window
    that skipped a middle turn would fabricate a dialogue). The
    synthetic convs (up to 8 turns, ~40-char lines) exercise full,
    partial, and empty contexts; the oracle recomputes the identical
    join + DESC cumsum + ordered string_agg."""
    from threat_intelligence_knowledge_graph_spark.operators.sft import (
        sft_pairs_with_context,
    )

    return sft_pairs_with_context(
        _synth_transcripts(spark, sf_dir), max_context_chars=120
    )


def q_transcript_sessionize(spark, sf_dir):
    """Gap-splitting long conversations into sessions (training context
    windows must not leak across multi-hour gaps; incidents split for
    triage): cumulative count of >40 s inter-turn gaps per conv — the
    synthetic grid's 24..56 s gaps make both outcomes common. ONE
    conv_id exchange shared by the lag window and the running sum;
    epoch-integer gap math."""
    from threat_intelligence_knowledge_graph_spark.operators.transcript_stats import (
        sessionize_conversations,
    )

    return sessionize_conversations(
        _synth_transcripts(spark, sf_dir), gap_seconds=40
    ).select("conv_id", "turn_idx", "session_idx", "session_id")


def q_url_normalize(spark, sf_dir):
    """URL canonicalization (web-corpus dedup prerequisite / CTI
    indicator identity): scheme+host lowercase, default ports stripped,
    empty path → '/', tracking params dropped and the rest sorted,
    fragment dropped, non-URLs → NULL. Four planted spelling variants
    per orderkey; the oracle mirrors the regexp/split/sort/join chain
    verbatim (functions/strings.py::url_normalize_expr)."""
    from threat_intelligence_knowledge_graph_spark.functions.strings import (
        url_normalize_expr,
    )

    k = F.col("o_orderkey")
    raw = F.concat(
        F.when(k % 2 == 0, F.lit("HTTP://")).otherwise(F.lit("HTTPS://")),
        F.lit("Example"),
        (k % 7).cast("string"),
        F.lit(".COM"),
        F.when(k % 4 == 0, F.lit(":80/a?utm_source=x&b=2&a=1"))
        .when(k % 4 == 1, F.lit(":443/A/B#frag"))
        .when(k % 4 == 2, F.lit(""))
        .otherwise(F.lit(":8080/x?gclid=1&z=9")),
    )
    return (
        _t(spark, sf_dir, "orders")
        .select("o_orderkey", raw.alias("u"))
        .select("o_orderkey", url_normalize_expr(F.col("u")).alias("url_norm"))
    )


def q_graph_cc_increment(spark, sf_dir):
    """Incremental connected components: a planted 6-node chain per
    orderkey (% 19) arrives in two batches — batch 1 leaves segments
    {0,1,2} and {3,4}; batch 2 bridges them (edge 2–3) and introduces
    the NEW node 5 (edge 4–5). Spark computes CC on batch 1 then merges
    batch 2 through the batch-bounded component graph; min-id labels
    compose exactly, so the oracle is a from-scratch recursive-CTE
    closure over the UNION of both batches."""
    from threat_intelligence_knowledge_graph_spark.operators.graph_algos import (
        connected_components,
        connected_components_increment,
    )

    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 19 == 0)
    base = o.select((F.col("o_orderkey") * 7).alias("k7"))

    def _edges(idxs):
        return base.select(
            "k7", F.explode(F.array(*[F.lit(i) for i in idxs])).alias("i")
        ).select(
            (F.col("k7") + F.col("i")).alias("a"),
            (F.col("k7") + F.col("i") + 1).alias("b"),
        )

    batch1 = _edges([0, 1, 3])
    batch2 = _edges([2, 4])
    a1 = connected_components(batch1)
    return connected_components_increment(a1, batch2).select(
        F.col("id").cast("long").alias("id"),
        F.col("component").cast("long").alias("component"),
    )


def q_graph_eigenvector(spark, sf_dir):
    """Eigenvector centrality (3 L2-normalized power-iteration steps,
    GDS gds.eigenvector analog) over the planted directed nation graph
    of q_graph_hits — HITS' authority half-step iterated alone, so the
    oracle unrolls the identical float-exact recurrence; both sides
    round to 9 (summation-order noise ~1e-16)."""
    from threat_intelligence_knowledge_graph_spark.operators.hits import (
        eigenvector_centrality,
    )

    nat = _t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    nkey = F.concat(F.lit("n"), F.col("n_nationkey").cast("string"))
    cyc = nat.select(
        nkey.alias("src_id"),
        F.concat(
            F.lit("n"), ((F.col("n_nationkey") + 1) % 25).cast("string")
        ).alias("dst_id"),
    )
    reg = nat.select(
        nkey.alias("src_id"),
        F.concat(F.lit("r"), F.col("n_regionkey").cast("string")).alias("dst_id"),
    )
    return eigenvector_centrality(cyc.union(reg), iterations=3).select(
        "id", F.round("score", 9).alias("score")
    )


def q_events_zorder(spark, sf_dir):
    """Z-order (Morton) clustering key over (user_id, floor(value)) —
    the OPTIMIZE ZORDER BY / Iceberg sort-rewrite key as a pure
    Catalyst unrolled shift/mask/or chain: bit i of column j lands at
    output bit i·n+j, out-of-range inputs clamp. Integer-exact, so the
    oracle evaluates the identical bit arithmetic."""
    from threat_intelligence_knowledge_graph_spark.operators.layout import (
        morton_key,
    )

    e = _t(spark, sf_dir, "events")
    key = morton_key(
        [F.col("user_id").cast("long"), F.floor(F.col("value")).cast("long")],
        bits=16,
    )
    return e.select("event_id", key.alias("zkey"))


def q_sample_temperature(spark, sf_dir):
    """Temperature-scaled mixture (share ∝ count^0.5 — the XLM-R
    exponentiated-sampling / pretraining data-mixing knob) over order
    status: α = 0.5 upweights the rare P status against O/F. sqrt is
    correctly-rounded IEEE on both engines, so the water level and the
    per-source thresholds are exactly reproducible; the oracle
    recomputes the identical chain."""
    from threat_intelligence_knowledge_graph_spark.operators.packing import (
        temperature_mixture,
    )

    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    return temperature_mixture(o, "o_orderkey", "o_orderstatus", alpha=0.5)


def q_similarity_pq_topk(spark, sf_dir):
    """Product-quantization ANN (FAISS IndexPQ/ADC analog, Jégou et al.
    2011) built integer-exact: 64 dims → 4 subspaces × 4 centroids via
    the deterministic integer-grid k-means, ADC lookup table from the
    identically-quantized query (vec_id 0), per-vector code-sum
    distance, (adist ASC, id) top-40 candidates, exact-cosine rerank to
    top-10. Codes, LUT, candidate set, and ranking all match the
    oracle bit-for-bit."""
    from threat_intelligence_knowledge_graph_spark.operators.similarity import (
        pq_topk,
    )

    emb = _t(spark, sf_dir, "embeddings")
    qvec = [float(x) for x in emb.filter("vec_id = 0").first()["embedding"]]
    return pq_topk(
        emb, qvec, k=10, m=4, k_sub=4, iterations=2, scale=1024,
        rerank_factor=4,
    )


def q_graph_node2vec(spark, sf_dir):
    """Deterministic node2vec walks (Grover & Leskovec 2016) with
    strong second-order bias (p=4 discourages returns, q=0.25 pushes
    outward) over the symmetrized chain+region graph of
    q_graph_random_walks. The weighted draw is an exponential race on
    hash-seeded clocks rounded BEFORE the compare (the dsir_resample
    discipline), so the oracle unrolls the identical md5 arithmetic,
    the identical prev/dist-1/dist-2 CASE, and the identical
    (clock, candidate) total order per step."""
    from threat_intelligence_knowledge_graph_spark.operators.graph_algos import (
        node2vec_walks,
    )

    e0 = _chain_region_edges(spark, sf_dir)
    e = e0.union(
        e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    return node2vec_walks(
        e, walk_length=4, walks_per_node=2, p=4.0, q=0.25
    ).select("walk_id", F.col("start").alias("start_id"), "step", "node")


def q_events_cooccur_npmi(spark, sf_dir):
    """NPMI collocation scoring (Bouma 2009) of event types over
    (user, hour) contexts: the edge-confidence signal that separates
    'both items are everywhere' (npmi ≈ 0) from 'these travel together'
    (npmi → 1). Contexts use epoch-integer hour buckets (the
    transcript_stats timezone-portable discipline); pairs with fewer
    than 2 shared contexts are pruned before the ln math. Oracle
    recomputes the identical integer counts and rounded npmi."""
    from threat_intelligence_knowledge_graph_spark.operators.collocation import (
        cooccur_npmi,
    )

    e = _t(spark, sf_dir, "events").select(
        F.concat_ws(
            "|",
            F.col("user_id").cast("string"),
            F.floor(F.unix_timestamp("ts") / 3600).cast("long").cast("string"),
        ).alias("ctx"),
        "event_type",
    )
    return cooccur_npmi(e, "ctx", "event_type", min_pair_count=2)


def q_kg_negative_samples(spark, sf_dir):
    """TransE-style filtered negative sampling (Bordes et al. 2013) over
    a planted LOCATED_IN/PART_OF triple set built from customer/supplier/
    nation: k=2 corruptions per positive, head-vs-tail side and the
    replacement-entity index both md5-derived (DuckDB md5_number_upper
    twin) from subj|pred|obj|sample_idx, replacement picked through a
    dense row_number entity index, degenerate draws dropped, and true
    triples anti-joined out (the filtered setting). The oracle recomputes
    the identical draws, index, and filters in SQL."""
    from threat_intelligence_knowledge_graph_spark.operators.kg_train import (
        negative_samples,
    )

    sup = _t(spark, sf_dir, "supplier").select(
        F.concat(F.lit("s"), F.col("s_suppkey").cast("string")).alias("subj"),
        F.lit("LOCATED_IN").alias("pred"),
        F.concat(F.lit("n"), F.col("s_nationkey").cast("string")).alias("obj"),
    )
    cus = _t(spark, sf_dir, "customer").select(
        F.concat(F.lit("c"), F.col("c_custkey").cast("string")).alias("subj"),
        F.lit("LOCATED_IN").alias("pred"),
        F.concat(F.lit("n"), F.col("c_nationkey").cast("string")).alias("obj"),
    )
    nat = _t(spark, sf_dir, "nation").select(
        F.concat(F.lit("n"), F.col("n_nationkey").cast("string")).alias("subj"),
        F.lit("PART_OF").alias("pred"),
        F.concat(F.lit("r"), F.col("n_regionkey").cast("string")).alias("obj"),
    )
    return negative_samples(sup.union(cus).union(nat), k=2)


def q_graph_lcc(spark, sf_dir):
    """Local clustering coefficient over the planted 3-clique + pendant
    graph (see q_graph_triangle_count): clique corners score 1.0 (deg 2)
    or 1/3 (the corner carrying the pendant, deg 3), tails 0.0 (deg 1)
    — every value analytic. Oracle: independent canonical three-way
    triangle join + degree count in SQL."""
    from threat_intelligence_knowledge_graph_spark.operators.graph_algos import (
        local_clustering_coefficient,
    )

    return local_clustering_coefficient(_triangle_gadget_edges(spark, sf_dir))


def _reciprocity_gadget_edges(spark, sf_dir):
    """Planted directed gadgets (one per 11th orderkey, nodes 4k..4k+2):
    a→b always, b→a only for EVEN gadget keys, a→c always, the c→c
    self-loop always (must be dropped), and a duplicate a→b (must
    dedupe) — so reciprocity depends on the even/odd gadget mix."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 11 == 0)
    k4 = (F.col("o_orderkey") * 4).alias("k4")
    even = (F.col("o_orderkey") % 2 == 0)
    return (
        o.select(k4, even.alias("ev"))
        .select("k4", F.explode(F.array(
            F.struct(F.lit(0).alias("i"), F.lit(1).alias("j"), F.lit(True).alias("keep")),
            F.struct(F.lit(0).alias("i"), F.lit(1).alias("j"), F.lit(True).alias("keep")),
            F.struct(F.lit(1).alias("i"), F.lit(0).alias("j"), F.col("ev").alias("keep")),
            F.struct(F.lit(0).alias("i"), F.lit(2).alias("j"), F.lit(True).alias("keep")),
            F.struct(F.lit(2).alias("i"), F.lit(2).alias("j"), F.lit(True).alias("keep")),
        )).alias("p"))
        .filter(F.col("p.keep"))
        .select(
            (F.col("k4") + F.col("p.i")).alias("src"),
            (F.col("k4") + F.col("p.j")).alias("dst"),
        )
    )


def q_graph_reciprocity(spark, sf_dir):
    """Directed-graph reciprocity over planted gadgets whose mutual
    fraction depends on the even/odd orderkey mix: parallel edges
    deduped, self-loops dropped, exact-integer counts, ONE round-6
    division; the mutual test is a keyed left-semi self-join on the
    swapped pair."""
    from threat_intelligence_knowledge_graph_spark.operators.graph_algos import (
        reciprocity,
    )

    return reciprocity(_reciprocity_gadget_edges(spark, sf_dir))


def q_events_cusum(spark, sf_dir):
    """Integer-exact CUSUM level-shift detector over per-type hourly
    volumes: deviations scaled by the group's bucket count so the
    recursive max(0, ·) statistic — re-expressed as cumsum minus the
    running-min prefix (two window functions, no recursion) — stays in
    exact integer arithmetic; alarm at 3× the group's total."""
    from threat_intelligence_knowledge_graph_spark.operators.anomaly import (
        cusum_level_shift,
    )

    return cusum_level_shift(_t(spark, sf_dir, "events"), h_factor=3)


def q_text_bm25_search(spark, sf_dir):
    """Okapi BM25 top-20 retrieval for the pinned query
    {merge, stream, vector}: per-(doc, term) float chains with the
    identical expression shape on both engines, per-doc sum rounded to
    6 BEFORE the (score DESC, doc_id ASC) rank — TakeOrderedAndProject,
    never a global sort."""
    from threat_intelligence_knowledge_graph_spark.operators.text_quality import (
        bm25_search,
    )

    return bm25_search(
        _t(spark, sf_dir, "documents"), ["merge", "stream", "vector"], k=20
    )


def q_text_blocklist(spark, sf_dir):
    """C4-style bad-word gate (exact lowercase token match against the
    pinned {dup, slow, error} list, whole-token so no Scunthorpe
    substring trap): integer hit counts, one round-6 division, strict->
    flag at 6% — quarantine-don't-drop (every doc returned with its
    flag). Scan-local codegen'd projection, zero shuffle."""
    from threat_intelligence_knowledge_graph_spark.operators.text_quality import (
        blocklist_filter,
    )

    return blocklist_filter(
        _t(spark, sf_dir, "documents"), ["dup", "slow", "error"], max_ratio=0.06
    )


def q_search_rrf(spark, sf_dir):
    """Hybrid retrieval by Reciprocal Rank Fusion (Cormack et al.,
    SIGIR'09) of two independent BM25 rankers (lexical queries
    {merge, stream, vector} and {slow, error}): score = Σ 1/(60+rank),
    round-6 before the fused (score DESC, id ASC) rank — a score-free
    combiner, so differently-scaled rankers compose without
    calibration."""
    from threat_intelligence_knowledge_graph_spark.operators.retrieval import rrf_fuse
    from threat_intelligence_knowledge_graph_spark.operators.text_quality import (
        bm25_search,
    )

    docs = _t(spark, sf_dir, "documents")
    r1 = bm25_search(docs, ["merge", "stream", "vector"], k=20)
    r2 = bm25_search(docs, ["slow", "error"], k=20)
    return rrf_fuse([r1, r2], k=60, top=20)


def q_text_ttr(spark, sf_dir):
    """Lexical diversity (type-token ratio) per document — the
    shuffled-repeat spam signal the consecutive-run repetition ratio
    misses. Integer token/type counts, one round-6 division, scan-local
    projection."""
    from threat_intelligence_knowledge_graph_spark.operators.text_quality import (
        type_token_ratio,
    )

    return type_token_ratio(_t(spark, sf_dir, "documents"))


def q_events_burstiness(spark, sf_dir):
    """Fano factor (variance/mean) of per-type hourly volumes via the
    n-scaled integer identity (n·Σx² − (Σx)²)/(n·Σx): exact-integer
    numerator and denominator, ONE identical division per group,
    round-6 — Poisson noise ≈ 1, campaign bursts ≫ 1, clocked beacons
    ≪ 1."""
    from threat_intelligence_knowledge_graph_spark.operators.stats import (
        burstiness_fano,
    )

    return burstiness_fano(_t(spark, sf_dir, "events"))


def q_events_dormancy(spark, sf_dir):
    """Resurrected-infrastructure triage (operators/anomaly.py::
    dormancy_reactivation): per synthetic indicator (event_type #
    user_id%29 — wider than the 5 bare types so dormancy varies),
    quiet-gap structure of the DISTINCT-timestamp sighting timeline at
    a 200,000 s dormancy threshold: gap count over the threshold,
    longest gap, the gap preceding the newest sighting, and the
    reactivated flag. Gaps are exact integer microseconds; the only
    float op is the shared /1e6 (round 6). Distinct-ts gaps make the
    multiset total-order-free — no tiebreak column, identical
    cross-engine."""
    from threat_intelligence_knowledge_graph_spark.operators.anomaly import (
        dormancy_reactivation,
    )

    ev = _t(spark, sf_dir, "events").select(
        F.concat(
            F.col("event_type"),
            F.lit("#"),
            (F.col("user_id") % 29).cast("string"),
        ).alias("ind"),
        "ts",
    )
    return dormancy_reactivation(
        ev, min_quiet_s=200000.0, key_col="ind"
    ).withColumnRenamed("key", "ind")


def q_events_churn(spark, sf_dir):
    """Day-over-day churn of the active (user, type) channel set:
    exact-integer intersection/union counts from a (group, bucket)
    keyed self-join with the period folded into the key, ONE round-6
    division per statistic; gap days emit no row."""
    from threat_intelligence_knowledge_graph_spark.operators.stats import (
        set_churn,
    )

    ev = _t(spark, sf_dir, "events").select(
        F.concat_ws("|", "user_id", "event_type").alias("chan"), "ts"
    )
    return set_churn(ev, group_col="chan")


def q_events_autocorr(spark, sf_dir):
    """Per-type hourly-volume autocorrelation at lag 24 (diurnal-cycle
    detector): squared-Pearson integer identity over the paired sample
    {(x_t, x_{t+24})} for co-observed hours, sign separate, ONE round-6
    division; zero-variance sides and short-overlap types dropped."""
    from threat_intelligence_knowledge_graph_spark.operators.stats import (
        autocorrelation,
    )

    return autocorrelation(_t(spark, sf_dir, "events"), lag_hours=24)


def q_events_novelty(spark, sf_dir):
    """Per-day first-seen novelty curve over (user, type) channel ids
    (higher cardinality than the 5 event types, so the curve decays
    non-trivially): epoch-integer day buckets, n_new = channels whose
    min-bucket is this bucket, exact integers + ONE round-6 division."""
    from threat_intelligence_knowledge_graph_spark.operators.stats import (
        novelty_curve,
    )

    ev = _t(spark, sf_dir, "events").select(
        F.concat_ws("|", "user_id", "event_type").alias("chan"), "ts"
    )
    return novelty_curve(ev, group_col="chan")


def q_events_trend(spark, sf_dir):
    """Per-type least-squares hourly-volume trend: integer hour index
    rebased to the frame's first bucket (1-row broadcast min), exact
    integer slope numerator/denominator, sign separate, ONE round-6
    division; single-hour types dropped (zero denominator)."""
    from threat_intelligence_knowledge_graph_spark.operators.stats import (
        trend_slope,
    )

    return trend_slope(_t(spark, sf_dir, "events"))


def q_events_correlation(spark, sf_dir):
    """Pairwise temporal correlation of per-type hourly volumes over
    the common bucket universe: exact-integer Pearson identity
    r² = (n·Σxy − Σx·Σy)²/((n·Σx²−(Σx)²)(n·Σy²−(Σy)²)), sign reported
    separately — ONE round-6 division per co-active pair."""
    from threat_intelligence_knowledge_graph_spark.operators.stats import (
        correlated_series,
    )

    return correlated_series(_t(spark, sf_dir, "events"))


def q_events_entropy(spark, sf_dir):
    """Shannon entropy (nats) of each user's event-type distribution —
    scripted automation / beacons sit at H ≈ 0, organic behavior near
    ln k. H = ln n − (Σ c·ln c)/n so every ln argument is an exact
    integer count; round-6 after the sum (corpus_kl discipline)."""
    from threat_intelligence_knowledge_graph_spark.operators.stats import (
        event_entropy,
    )

    return event_entropy(_t(spark, sf_dir, "events"))


def q_events_top_sequences(spark, sf_dir):
    """Top-20 consecutive event-type trigrams across all users
    (kill-chain / playbook pattern mining): n−1 lag columns over ONE
    (user) window exchange ordered by the (ts, id) total key, exact
    integer counts, (n DESC, pattern ASC) rank AFTER the top-k cut."""
    from threat_intelligence_knowledge_graph_spark.operators.stats import (
        top_event_sequences,
    )

    return top_event_sequences(_t(spark, sf_dir, "events"), n=3, k=20)


def q_corpus_source_gini(spark, sf_dir):
    """Gini coefficient of per-source corpus contribution in CHARS (mixture
    balance): rank formula G = (Σ(2i−1)·x_i − n·Σx)/(n·Σx) over totals
    sorted by (count, source) — integer ranks over identical physical
    rows, exact-integer numerator/denominator, ONE round-6 division."""
    from threat_intelligence_knowledge_graph_spark.operators.stats import (
        gini_concentration,
    )

    return gini_concentration(
        _t(spark, sf_dir, "documents"), group_col="source", weight_col="n_chars"
    )


def q_events_beacons(spark, sf_dir):
    """RITA-style beacon regularity per (user, event_type) channel:
    cv² of epoch-integer inter-arrival gaps over the (ts, id) total
    order via the exact-integer identity (n·Σg² − (Σg)²)/(Σg)² — ONE
    round-6 division per channel; clocked implants ≈ 0, human ≳ 1."""
    from threat_intelligence_knowledge_graph_spark.operators.anomaly import (
        beacon_regularity,
    )

    return beacon_regularity(_t(spark, sf_dir, "events"))


def q_events_markov(spark, sf_dir):
    """First-order Markov transition estimates over per-user event
    sequences: exact-integer pair counts over the (ts, event_id) total
    order (same-instant events sequence identically cross-engine),
    ONE round-6 division per transition."""
    from threat_intelligence_knowledge_graph_spark.operators.stats import (
        markov_transitions,
    )

    return markov_transitions(_t(spark, sf_dir, "events"))


def q_corpus_top_ngrams(spark, sf_dir):
    """Corpus-wide top-20 word bigrams (boilerplate/template-phrase
    discovery): scan-side explode into one map-side-combining count,
    fully deterministic (n DESC, ngram ASC) rank assigned after the
    TakeOrderedAndProject cut."""
    from threat_intelligence_knowledge_graph_spark.operators.text_quality import (
        top_ngrams,
    )

    return top_ngrams(_t(spark, sf_dir, "documents"), n=2, k=20)


def q_vocab_prune(spark, sf_dir):
    """df-band vocabulary selection (sklearn min_df/max_df contract):
    exact integer distinct-doc counts, floor(ratio·N) upper bound —
    hapax noise dropped below, stopword-like ubiquity above."""
    from threat_intelligence_knowledge_graph_spark.operators.text_quality import (
        vocab_prune,
    )

    return vocab_prune(
        _t(spark, sf_dir, "documents"), min_df=30, max_df_ratio=0.77
    )


def q_vocab_growth(spark, sf_dir):
    """Per-source Heaps'-law diagnostic: tokens, distinct types, round-6
    ratio — a source whose types stop growing with tokens is
    boilerplate-heavy and wants dedup before mixing."""
    from threat_intelligence_knowledge_graph_spark.operators.text_quality import (
        vocab_growth,
    )

    return vocab_growth(_t(spark, sf_dir, "documents"))


def q_bpe_train(spark, sf_dir):
    """Distributed BPE tokenizer training: 6 merge iterations over the
    DISTINCT word vocabulary (Heaps'-law small vs the corpus), each a
    pair-count agg + 1-row argmax collect + one codegen'd replace
    projection; deterministic (cnt DESC, left ASC, right ASC) argmax."""
    from threat_intelligence_knowledge_graph_spark.operators.bpe import bpe_train

    return bpe_train(_t(spark, sf_dir, "documents"), k=6)


def q_bpe_token_counts(spark, sf_dir):
    """Per-doc token stats under the corpus-trained 6-merge BPE:
    char-level vs post-merge counts + round-6 compression ratio; the
    merge loop touches only the distinct-word vocab, per-doc work is a
    word-count explode joined back on the word key."""
    from threat_intelligence_knowledge_graph_spark.operators.bpe import (
        bpe_token_counts,
    )

    return bpe_token_counts(_t(spark, sf_dir, "documents"), k=6)


def _eval_planted_triples(spark, sf_dir):
    """Planted predicted/gold triple pair for the evaluation entries:
    gold is one triple per orderkey (pred cycles through the three KG
    relation names on k%3); predicted drops every k%5==0 triple (pure
    FN) and corrupts the object of every surviving k%7==0 one (an FP
    plus its FN). Both sides are pure Catalyst projections of the same
    scan, so the oracle rebuilds them verbatim."""
    k = F.col("o_orderkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey")
    pred_name = (
        F.when(k % 3 == 0, "RESOLVES_TO")
        .when(k % 3 == 1, "COMMUNICATES_WITH")
        .otherwise("CONTAINS")
    )
    gold = o.select(
        F.concat(F.lit("E"), k).alias("subj"),
        pred_name.alias("pred"),
        F.concat(F.lit("T"), k).alias("obj"),
    )
    predicted = o.filter(k % 5 != 0).select(
        F.concat(F.lit("E"), k).alias("subj"),
        pred_name.alias("pred"),
        F.when(k % 7 == 0, F.concat(F.lit("X"), k))
        .otherwise(F.concat(F.lit("T"), k))
        .alias("obj"),
    )
    return predicted, gold


def q_eval_triple_pr(spark, sf_dir):
    """Corpus-level triple P/R/F1 (operators/evaluation.py::eval_triples)
    — the north-rule acceptance metric (triple set match P/R >= 0.95 vs
    the reference extractor) as a first-class distributed computation:
    set-distinct both sides, ONE broadcastable left-outer join on the
    composite key, one count-agg; every count exact integer, each ratio
    a single two-integer double division (bit-stable cross-engine). The
    reference's own harness records counts only
    (evaluation/model_evaluation.py:129-138) and its README concedes
    counts != quality (README.md:119) — this operator closes that gap."""
    from threat_intelligence_knowledge_graph_spark.operators.evaluation import (
        eval_triples,
    )

    predicted, gold = _eval_planted_triples(spark, sf_dir)
    return eval_triples(predicted, gold, broadcast_gold=True)


def q_eval_triple_pr_by_pred(spark, sf_dir):
    """Per-predicate P/R/F1 breakdown
    (operators/evaluation.py::eval_triples_by_pred): a regression in a
    single relation rule stays visible even when the corpus aggregate
    clears the bar. Three dimension-sized per-predicate frames
    full-outer-joined on pred (rows = |predicate vocabulary|)."""
    from threat_intelligence_knowledge_graph_spark.operators.evaluation import (
        eval_triples_by_pred,
    )

    predicted, gold = _eval_planted_triples(spark, sf_dir)
    return eval_triples_by_pred(predicted, gold).orderBy("pred")


def q_eval_cluster_pairwise(spark, sf_dir):
    """Pairwise clustering P/R/F1 for entity canonicalization
    (operators/evaluation.py::eval_clusters_pairwise): gold groups
    orderkeys in runs of 8 (floor(k/8)); predicted uses coarser runs of
    16 but splits every k%5==0 item into a singleton — so both merge
    and split errors are exercised. Computed via contingency cells
    (three keyed count-aggs, C(n,2) in exact bigints via shiftright) —
    no pair set ever materializes, which is what makes the metric
    computable under a hot mega-cluster at 100 TB."""
    from threat_intelligence_knowledge_graph_spark.operators.evaluation import (
        eval_clusters_pairwise,
    )

    k = F.col("o_orderkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey")
    gold = o.select(
        F.concat(F.lit("I"), k).alias("item"),
        F.concat(F.lit("g"), F.floor(k / 8)).alias("cluster_id"),
    )
    predicted = o.select(
        F.concat(F.lit("I"), k).alias("item"),
        F.when(k % 5 == 0, F.concat(F.lit("s"), k))
        .otherwise(F.concat(F.lit("p"), F.floor(k / 16)))
        .alias("cluster_id"),
    )
    return eval_clusters_pairwise(predicted, gold)


def _synth_pref_transcripts(spark, sf_dir):
    """Preference-mining transcript corpus: strict user/assistant
    alternation (odd turn = user), PROMPTS SHARED ACROSS CONVERSATIONS
    (keyed by o_orderkey % 200, so each prompt collects candidates
    from many conversations with different terminal outcomes), and
    responses of varying length (repeat('x', okey % 9) suffix) so the
    longest-completed-response selection is non-trivial. Planted
    failures (precedence mirrors the oracle exactly): every 7th conv's
    LAST turn becomes a tool traceback (tool_failure), every 11th
    conv's turns 2..4 stutter 'retrying tool call' (looping when ≥3
    such turns survive the tool plant), odd-length convs end on a user
    turn (abandoned)."""
    o = _t(spark, sf_dir, "orders")
    okey = F.col("o_orderkey")
    n = okey % 5 + 2
    rows = o.select(
        okey,
        n.alias("_n"),
        F.explode(F.sequence(F.lit(1).cast("long"), n)).alias("turn_idx"),
    )
    i = F.col("turn_idx")
    k = okey % 200
    step = F.floor((i + 1) / 2)
    is_tool_plant = (okey % 7 == 0) & (i == F.col("_n"))
    role = (
        F.when(is_tool_plant, F.lit("tool"))
        .when(i % 2 == 1, F.lit("user"))
        .otherwise(F.lit("assistant"))
    )
    text = (
        F.when(is_tool_plant, F.lit("Traceback: tool exploded"))
        .when(
            (okey % 11 == 0) & i.between(2, 4), F.lit("retrying tool call")
        )
        .when(
            i % 2 == 1,
            F.concat(
                F.lit("prompt "), k.cast("string"),
                F.lit(" step "), step.cast("string"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit("answer p"), k.cast("string"),
                F.lit(" s"), step.cast("string"),
                F.lit(" "),
                F.repeat(F.lit("x"), (okey % 9).cast("int")),
            )
        )
    )
    ts_sec = F.lit(1600000000) + okey * 1000 + i * 40
    return rows.select(
        okey.cast("string").alias("conv_id"),
        i.cast("int").alias("turn_idx"),
        role.alias("role"),
        text.alias("text"),
        F.when(role == "tool", F.lit("python")).alias("tool"),
        F.timestamp_seconds(ts_sec).alias("ts"),
    )


_SYNTH_PREF_TRANSCRIPTS_SQL = """
          SELECT cast(o_orderkey AS varchar) AS conv_id,
                 cast(i AS int) AS turn_idx,
                 CASE WHEN o_orderkey % 7 = 0
                           AND i = (o_orderkey % 5) + 2 THEN 'tool'
                      WHEN i % 2 = 1 THEN 'user'
                      ELSE 'assistant' END AS role,
                 CASE WHEN o_orderkey % 7 = 0
                           AND i = (o_orderkey % 5) + 2
                        THEN 'Traceback: tool exploded'
                      WHEN o_orderkey % 11 = 0 AND i BETWEEN 2 AND 4
                        THEN 'retrying tool call'
                      WHEN i % 2 = 1
                        THEN 'prompt ' || cast(o_orderkey % 200 AS varchar)
                             || ' step ' || cast((i + 1) // 2 AS varchar)
                      ELSE 'answer p' || cast(o_orderkey % 200 AS varchar)
                           || ' s' || cast((i + 1) // 2 AS varchar)
                           || ' '
                           || repeat('x', cast(o_orderkey % 9 AS int))
                 END AS text
          FROM orders,
               UNNEST(generate_series(1, (o_orderkey % 5) + 2)) AS t(i)
"""

# Shared oracle scaffolding over the preference corpus: the sft
# adjacency pairs CTE and the conversation_outcomes CTE chain (loop
# runs / last turn / last-tool-error, fixed precedence) — composed by
# the dpo_pairs and best_of_n_pairs oracles below.
_PREF_PAIRS_OUTCOMES_SQL = f"""
            WITH tr AS ({_SYNTH_PREF_TRANSCRIPTS_SQL}),
            p AS (
              SELECT conv_id, turn_idx AS prompt_turn_idx, role,
                     text AS prompt,
                     lead(role) OVER w AS next_role,
                     lead(text) OVER w AS response
              FROM tr
              WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
            ),
            pairs AS (
              SELECT conv_id, prompt_turn_idx, prompt, response
              FROM p
              WHERE role = 'user' AND next_role = 'assistant'
                AND length(coalesce(prompt, '')) >= 1
                AND length(coalesce(response, '')) >= 1
            ),
            f AS (
              SELECT conv_id, turn_idx,
                     CASE WHEN row_number() OVER w > 1
                               AND lag(text) OVER w
                                   IS NOT DISTINCT FROM text
                          THEN 0 ELSE 1 END AS brk
              FROM tr
              WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
            ),
            runs AS (
              SELECT conv_id, turn_idx,
                     sum(brk) OVER (PARTITION BY conv_id
                                    ORDER BY turn_idx) AS run
              FROM f
            ),
            lp AS (
              SELECT conv_id, max(pos) >= 3 AS is_looping FROM (
                SELECT conv_id,
                       row_number() OVER (PARTITION BY conv_id, run
                                          ORDER BY turn_idx) AS pos
                FROM runs
              ) GROUP BY conv_id
            ),
            last AS (
              SELECT conv_id, arg_max(role, turn_idx) AS last_role
              FROM tr GROUP BY conv_id
            ),
            te AS (
              SELECT conv_id,
                     coalesce(regexp_matches(
                       arg_max(text, turn_idx),
                       'error|exception|traceback|failed', 'i'),
                       FALSE) AS terr
              FROM tr WHERE role = 'tool' GROUP BY conv_id
            ),
            oc AS (
              SELECT last.conv_id,
                     CASE WHEN lp.is_looping THEN 'looping'
                          WHEN coalesce(te.terr, FALSE)
                            THEN 'tool_failure'
                          WHEN last_role = 'user' THEN 'abandoned'
                          ELSE 'completed' END AS outcome
              FROM last
              JOIN lp USING (conv_id)
              LEFT JOIN te USING (conv_id)
            ),
            lab AS (
              SELECT pairs.*, oc.outcome
              FROM pairs JOIN oc USING (conv_id)
            )
"""


def q_dpo_pairs(spark, sf_dir):
    """DPO preference pairs over the shared-prompt preference corpus:
    per prompt, the longest completed-conversation response (chosen)
    vs the worst-outcome failing response (rejected, severity looping
    > tool_failure > abandoned), both deterministically tie-broken;
    inner join drops prompts lacking either side."""
    from threat_intelligence_knowledge_graph_spark.operators.preference import (
        dpo_pairs,
    )

    return dpo_pairs(_synth_pref_transcripts(spark, sf_dir))


def q_best_of_n_pairs(spark, sf_dir):
    """Best-of-n rejection sampling over the preference corpus's SFT
    pairs, scored by response length: per prompt keep the single
    highest-scoring response (ties → lowest conv_id, turn) plus the
    candidate-group size."""
    from threat_intelligence_knowledge_graph_spark.operators.preference import (
        best_of_n,
    )
    from threat_intelligence_knowledge_graph_spark.operators.sft import (
        sft_pairs,
    )

    return best_of_n(
        sft_pairs(_synth_pref_transcripts(spark, sf_dir)),
        "n_response_chars",
    )


def q_dedup_paragraphs(spark, sf_dir):
    """Paragraph-level boilerplate removal (CCNet/Dolma granularity —
    the dedup document-level passes cannot express): every doc carries
    a planted COOKIE footer (boilerplate in ALL docs), every third doc
    a SUBSCRIBE banner, plus its own body paragraph; the frequency rule
    removes exactly the planted paragraphs (and any body shared by the
    corpus's exact-dup families) while preserving paragraph order."""
    from threat_intelligence_knowledge_graph_spark.operators.dedup import (
        paragraph_dedup,
    )

    d = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.concat_ws(
            "\n",
            F.col("text"),
            F.lit("COOKIE NOTICE accept all"),
            F.when(
                F.col("doc_id") % 3 == 0, F.lit("SUBSCRIBE to our newsletter")
            ),
        ).alias("text"),
    )
    return paragraph_dedup(d, min_docs=2)


def q_er_sorted_neighborhood(spark, sf_dir):
    """Sorted-neighborhood blocking (Hernandez-Stolfo merge/purge) over
    the reversed customer name (the classic last-chars-first blocking
    key): candidate pairs within 5 positions of the (key, c_custkey)
    total order — the TeraSort-style sampled-boundary rank makes the
    global window a keyed block join; the oracle is DuckDB's literal
    row_number self-join."""
    from threat_intelligence_knowledge_graph_spark.operators.canonicalize import (
        sorted_neighborhood_pairs,
    )

    c = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("long").alias("node_id"),
        F.reverse(F.col("c_name")).alias("block_key"),
    )
    return sorted_neighborhood_pairs(
        c, window=5, n_buckets=8, sample_pct=10
    )


def q_kg_schema_audit(spark, sf_dir):
    """Domain/range conformance audit (SHACL-lite) over a constructed
    triple table with planted violations: the conformant RESOLVES_TO
    base plus reversed-endpoint (% 10), unknown-predicate (% 17) and
    dangling-object (% 23) rows — the audit's verdict per row is
    analytic. Signature table from the same RELATION_RULES the
    extractor runs on (operators/triples.relation_signatures)."""
    from threat_intelligence_knowledge_graph_spark.operators.triples import (
        validate_triple_schema,
    )

    o = _t(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    dom = F.concat(
        F.lit("Domain_Evil-"), k.cast("string"), F.lit("_Example_Net")
    )
    ip = F.concat(
        F.lit("Ipv4_10_"),
        (k % 250).cast("string"),
        F.lit("_"),
        ((k * 7) % 250).cast("string"),
        F.lit("_"),
        ((k % 249) + 1).cast("string"),
    )
    nodes = (
        o.select(F.lit("Domain").alias("node_label"), dom.alias("node_id"))
        .unionByName(
            o.select(F.lit("Ipv4").alias("node_label"), ip.alias("node_id"))
        )
        .distinct()
    )
    base = o.select(
        dom.alias("subj"), F.lit("RESOLVES_TO").alias("pred"), ip.alias("obj")
    )
    reversed_ = o.filter(k % 10 == 0).select(
        ip.alias("subj"), F.lit("RESOLVES_TO").alias("pred"), dom.alias("obj")
    )
    unknown_pred = o.filter(k % 17 == 0).select(
        dom.alias("subj"), F.lit("FOOBAR").alias("pred"), ip.alias("obj")
    )
    dangling = o.filter(k % 23 == 0).select(
        dom.alias("subj"),
        F.lit("RESOLVES_TO").alias("pred"),
        F.concat(F.lit("Missing_"), k.cast("string")).alias("obj"),
    )
    triples = (
        base.unionByName(reversed_)
        .unionByName(unknown_pred)
        .unionByName(dangling)
    )
    return validate_triple_schema(triples, nodes)


def q_kg_scd2_intervals(spark, sf_dir):
    """SCD-type-2 validity intervals for temporal triples over a
    deterministic observation stream derived from events (domain →
    resolved-IP observations): change runs per (subj, pred) with
    valid_from/valid_to chaining and is_current flags — the
    re-pointed-infrastructure timeline first/last-seen cannot express
    (a returning object opens a NEW interval)."""
    from threat_intelligence_knowledge_graph_spark.operators.temporal_join import (
        scd2_intervals,
    )

    e = _t(spark, sf_dir, "events")
    obs = e.select(
        F.concat(
            F.lit("Domain_"), (F.col("user_id") % 40).cast("string")
        ).alias("subj"),
        F.lit("RESOLVES_TO").alias("pred"),
        F.concat(
            F.lit("Ipv4_"), (F.col("event_id") % 7).cast("string")
        ).alias("obj"),
        F.col("ts"),
    )
    return scd2_intervals(obs)


def q_er_verified_matches(spark, sf_dir):
    """The full classic ER candidate path blocking → verify: sorted-
    neighborhood candidates over part names, scored with normalized
    Levenshtein similarity (JVM built-in on both engines) and
    thresholded — the pairs that would feed connected-components
    resolution."""
    from threat_intelligence_knowledge_graph_spark.operators.canonicalize import (
        sorted_neighborhood_pairs,
        verify_pairs_edit_distance,
    )

    p = _t(spark, sf_dir, "part").select(
        F.col("p_partkey").cast("long").alias("node_id"),
        F.col("p_name").alias("name"),
    )
    pairs = sorted_neighborhood_pairs(
        p, key_col="name", id_col="node_id", window=4, n_buckets=8,
        sample_pct=10,
    )
    return verify_pairs_edit_distance(
        pairs, p, key_col="name", id_col="node_id", tau=0.45
    )


def q_kg_temporal_two_hop(spark, sf_dir):
    """Time-respecting two-hop chains (lateral-movement primitive):
    a→b then b→c with t2 > t1 within 3 days, over a deterministic
    sparse edge stream derived from events (every 3rd event; node
    space mod 199 keeps pivot fan-out small). Strictly-causal pairs
    only — a static two-hop would also report the impossible
    B→C-before-A→B chains."""
    from threat_intelligence_knowledge_graph_spark.operators.temporal_join import (
        temporal_two_hop,
    )

    e = _t(spark, sf_dir, "events").filter(F.col("event_id") % 3 == 0)
    edges = e.select(
        F.concat(
            F.lit("N"), (F.col("event_id") % 199).cast("string")
        ).alias("src"),
        F.concat(
            F.lit("N"), ((F.col("event_id") * 7 + 1) % 199).cast("string")
        ).alias("dst"),
        F.col("ts"),
    )
    return temporal_two_hop(edges, max_gap_s=3 * 86400)


def q_kg_corroboration(spark, sf_dir):
    """Knowledge-fusion confidence (noisy-OR over DISTINCT sources) for
    the lineitem-derived supply triples: part -SUPPLIED_BY-> supplier
    observed by order-derived source feeds; a feed repeating itself is
    ONE vote."""
    from threat_intelligence_knowledge_graph_spark.operators.triples import (
        triple_corroboration,
    )

    li = _t(spark, sf_dir, "lineitem")
    obs = li.select(
        F.concat(F.lit("part_"), F.col("l_partkey").cast("string")).alias(
            "subj"
        ),
        F.lit("SUPPLIED_BY").alias("pred"),
        F.concat(F.lit("supp_"), F.col("l_suppkey").cast("string")).alias(
            "obj"
        ),
        F.concat(
            F.lit("feed_"), (F.col("l_orderkey") % 13).cast("string")
        ).alias("source"),
    )
    return triple_corroboration(obs, base_conf=0.7)


_RANK_EVAL_QUERIES = {
    "q_msv": ["merge", "stream", "vector"],
    "q_ms": ["merge", "stream"],
}


def q_search_rank_eval(spark, sf_dir):
    """Per-query MRR/MAP@10 of BM25 rankings for the two pinned term
    sets against binary relevance rel(q, d) = "d contains >= 2 distinct
    terms of q" — the multi-query members of the retrieval-evaluation
    family (search_ndcg grades one graded ranking). AP terms are
    lcm-scaled exact integers; rr/ap each ONE round-6 division."""
    from threat_intelligence_knowledge_graph_spark.operators.retrieval import (
        rank_eval,
    )
    from threat_intelligence_knowledge_graph_spark.operators.text_quality import (
        bm25_search,
    )

    d = _t(spark, sf_dir, "documents")
    toks = F.expr("regexp_extract_all(lower(text), '[a-z0-9]{2,}', 0)")
    rankings = None
    qrels = None
    for qid, terms in _RANK_EVAL_QUERIES.items():
        r = bm25_search(d, terms, k=10).select(
            F.lit(qid).alias("query_id"), "doc_id", "rk"
        )
        q = (
            d.select(
                "doc_id",
                sum(
                    F.array_contains(toks, t).cast("int") for t in terms
                ).alias("_nt"),
            )
            .filter(F.col("_nt") >= 2)
            .select(F.lit(qid).alias("query_id"), "doc_id")
        )
        rankings = r if rankings is None else rankings.unionAll(r)
        qrels = q if qrels is None else qrels.unionAll(q)
    return rank_eval(rankings, qrels, k=10)


def q_text_readability(spark, sf_dir):
    """Flesch reading-ease per document with the deterministic
    vowel-run syllable heuristic — exact integer counts, two
    correctly-rounded divisions, round-6; scan-local projection."""
    from threat_intelligence_knowledge_graph_spark.operators.text_quality import (
        readability,
    )

    return readability(_t(spark, sf_dir, "documents"))


def q_sample_weighted(spark, sf_dir):
    """Efraimidis-Spirakis weighted sample without replacement (k=50,
    weight = doc length): md5-derived u, priority = -ln(u)/w rounded
    to 6 with doc_id tie-break BEFORE the top-k cut — both engines
    pick identical rows; TakeOrderedAndProject, no global sort."""
    from threat_intelligence_knowledge_graph_spark.operators.packing import (
        weighted_sample,
    )

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.length("text").cast("double").alias("w")
    )
    return weighted_sample(d, "doc_id", "w", k=50).select(
        "doc_id", "priority", "rk"
    )


def q_events_seasonality(spark, sf_dir):
    """Per-type hour-of-day seasonality card: exact-integer chi-square
    against the uniform-over-24-hours null via (24*sum(c^2) - n^2)/n,
    peak hour with smallest-hour tie-break, ONE round-6 division per
    emitted ratio; single (type, hour) count-agg, window + final agg
    share one type-keyed exchange."""
    from threat_intelligence_knowledge_graph_spark.operators.stats import (
        hourly_seasonality,
    )

    return hourly_seasonality(_t(spark, sf_dir, "events"))


def q_graph_transitivity(spark, sf_dir):
    """Global clustering coefficient over the planted 3-clique+pendant
    gadgets: per gadget 3 closed wedges of 5 total (degrees 2,2,3,1),
    so the oracle is ANALYTIC — transitivity = 0.6 with exact gadget
    counts; the Spark side runs the real three-way-join pipeline."""
    from threat_intelligence_knowledge_graph_spark.operators.graph_algos import (
        transitivity,
    )

    return transitivity(_triangle_gadget_edges(spark, sf_dir))


def q_graph_rich_club(spark, sf_dir):
    """Rich-club curve over the planted 3-clique+pendant gadgets. The
    G disjoint gadgets make the curve ANALYTIC: spectrum {1,2,3};
    k=1 club = the 3G clique nodes with their 3G internal edges
    (phi = 2/(3G-1)); k=2 club = the G degree-3 corners, zero edges
    between gadgets (phi = 0); k=3 club empty (omitted)."""
    from threat_intelligence_knowledge_graph_spark.operators.graph_algos import (
        rich_club,
    )

    return rich_club(_triangle_gadget_edges(spark, sf_dir))


def q_graph_avg_nbr_deg(spark, sf_dir):
    """Average neighbor degree per node over the planted gadgets —
    analytically per gadget: corners 3k/3k+1 see (2+3)/2, the hub
    3k+2 sees (2+2+1)/3, the pendant 3k+3 sees 3/1."""
    from threat_intelligence_knowledge_graph_spark.operators.graph_algos import (
        avg_neighbor_degree,
    )

    return avg_neighbor_degree(_triangle_gadget_edges(spark, sf_dir))


def q_events_k_anonymity(spark, sf_dir):
    """k-anonymity audit of the (user_id, event_type, hour-of-day)
    projection of the event log at k=5 — time-of-activity is the
    classic indirect identifier: every quasi class smaller than 5 is
    a release fingerprint. One keyed count-agg + filter."""
    from threat_intelligence_knowledge_graph_spark.operators.quality_checks import (
        k_anonymity_audit,
    )

    ev = _t(spark, sf_dir, "events").select(
        "user_id", "event_type", F.hour("ts").cast("int").alias("hour")
    )
    return k_anonymity_audit(ev, ["user_id", "event_type", "hour"], k=5)


def q_events_trimmed_mean(spark, sf_dir):
    """Per-type 10%-trimmed mean of event values: Fraction-exact trim
    counts over the (value, event_id) total order, decimal(38,6)
    order-independent sum, ONE round-6 division; rank window and
    final aggregate share one type-keyed exchange."""
    from threat_intelligence_knowledge_graph_spark.operators.stats import (
        trimmed_mean,
    )

    return trimmed_mean(
        _t(spark, sf_dir, "events"), "value", "event_type", "event_id", trim=0.1
    )


def q_events_l_diversity(spark, sf_dir):
    """l-diversity audit companion to the k-anonymity entry: for the
    (user_id, event_type, hour) quasi projection, classes whose
    sensitive attribute (the day-of-month of activity — the temporal
    fingerprint) takes < 3 distinct values; ONE keyed aggregate with
    partial count-distinct + scan-local filter."""
    from threat_intelligence_knowledge_graph_spark.operators.quality_checks import (
        l_diversity_audit,
    )

    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.hour("ts").cast("int").alias("hour"),
        F.dayofmonth("ts").cast("int").alias("day"),
    )
    return l_diversity_audit(
        ev, ["user_id", "event_type", "hour"], "day", l=3
    )


def q_events_rate_peaks(spark, sf_dir):
    """Sliding 24h-window rate profile per user (peak trailing-window
    count + events over a 3/day limit) — epoch-integer RANGE frame,
    exact bigints only; the frame window and the per-user aggregate
    share ONE user-keyed exchange."""
    from threat_intelligence_knowledge_graph_spark.operators.anomaly import (
        rate_peaks,
    )

    return rate_peaks(
        _t(spark, sf_dir, "events"), window_s=86400, limit=3
    )


def q_hll_user_overlap(spark, sf_dir):
    """Pairwise distinct-user overlap between event types by HLL
    inclusion-exclusion: per-type sketches from ONE scan, densified
    register equi-join, scaled-integer harmonic-sum witnesses
    (hash-checked strings), one fixed-order float expression round-3."""
    from threat_intelligence_knowledge_graph_spark.operators.sketches import (
        hll_overlap,
    )

    ev = _t(spark, sf_dir, "events")
    return hll_overlap(ev, "user_id", "event_type")


def q_events_survival(spark, sf_dir):
    """Kaplan-Meier signup→purchase conversion curve with right
    censoring at the corpus horizon: exact integer-µs day durations,
    descending-cumsum risk sets, running ln-sum survival (cumulative
    frame = deterministic addition order), round-6."""
    from threat_intelligence_knowledge_graph_spark.operators.stats import (
        survival_curve,
    )

    return survival_curve(_t(spark, sf_dir, "events"), "signup", "purchase")


def q_events_value_pct(spark, sf_dir):
    """Per-type percent-rank normalization of event values (the
    cross-source score-mixing transform): both engines define
    percent_rank identically, ties share a rank; NULL values filtered
    (NULLS FIRST vs LAST differs across engines); round-6."""
    from threat_intelligence_knowledge_graph_spark.operators.stats import (
        percentile_normalize,
    )

    ev = (
        _t(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select("event_id", "event_type", "value")
    )
    return percentile_normalize(ev, "value", "event_type").select(
        "event_id", "event_type", "pct"
    )


def q_similarity_mutual_best(spark, sf_dir):
    """Reciprocal best match over the every-7th-embedding subset: the
    batch_topk candidate lists (k=5, rounded-cosine rank) filtered to
    pairs where each side is the other's top non-self candidate —
    the high-precision ER pairing rule."""
    from threat_intelligence_knowledge_graph_spark.operators.similarity import (
        batch_topk,
        mutual_best,
    )

    sub = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 7 == 0)
    scores = batch_topk(
        sub,
        sub.select(F.col("vec_id").alias("query_id"), "embedding"),
        k=5,
    )
    return mutual_best(scores)


def q_eval_calibration(spark, sf_dir):
    """Reliability diagram + per-bin Brier of a SYNTHETIC calibrated
    scorer (p = md5_a/1e6, y = [md5_b < md5_a] — P(y=1|p) = p by
    construction, so the diagram is diagonal): fixed-point millionths,
    exact integer bin/sum arithmetic, one round-6 division per ratio."""
    from threat_intelligence_knowledge_graph_spark.operators.evaluation import (
        calibration_table,
    )
    from threat_intelligence_knowledge_graph_spark.operators.packing import (
        _md5_bucket,
    )

    d = _t(spark, sf_dir, "documents").select(
        (_md5_bucket("doc_id", "cal_p").cast("double") / F.lit(1e6)).alias("p"),
        (_md5_bucket("doc_id", "cal_y") < _md5_bucket("doc_id", "cal_p"))
        .cast("int")
        .alias("y"),
    )
    return calibration_table(d, "p", "y")


def q_graph_degree_hist(spark, sf_dir):
    """Degree distribution over the planted gadgets — analytic:
    {1: G (pendants), 2: 2G (clique corners), 3: G (hubs)}."""
    from threat_intelligence_knowledge_graph_spark.operators.graph_algos import (
        degree_histogram,
    )

    return degree_histogram(_triangle_gadget_edges(spark, sf_dir))


def q_graph_hill_tail(spark, sf_dir):
    """Hill tail-exponent MLE at d_min=2 over the planted gadgets —
    analytic: tail degrees {2×2G, 3×G}, Σ ln = G·ln(3/2), so
    alpha = 1 + 3G/(G·ln 1.5); the ln sum runs over the
    dimension-sized histogram."""
    from threat_intelligence_knowledge_graph_spark.operators.graph_algos import (
        hill_tail,
    )

    return hill_tail(_triangle_gadget_edges(spark, sf_dir), d_min=2)


def _auc_scored(spark, sf_dir):
    """Synthetic scored/labeled frame for the ranking-metric entries:
    score p = (md5_a % 1000)/1000 (thousandths — deliberate heavy
    ties so the mid-rank tie convention is exercised), label y = 1
    with probability p via an independent md5 draw (yb < p·1e6), so
    the scorer is informative (AUC well above ½) but imperfect."""
    from threat_intelligence_knowledge_graph_spark.operators.packing import (
        _md5_bucket,
    )

    th = _md5_bucket("doc_id", "auc_s", 1000)
    return _t(spark, sf_dir, "documents").select(
        (th.cast("double") / F.lit(1000.0)).alias("p"),
        (_md5_bucket("doc_id", "auc_y") < th * F.lit(1000))
        .cast("int")
        .alias("y"),
    )


def q_eval_roc_auc(spark, sf_dir):
    """Exact tie-aware ROC-AUC (Mann-Whitney rank-sum identity) of the
    synthetic calibrated scorer — integer rank arithmetic over
    distinct-score groups, ONE round-6 division. Oracle: the identical
    cumulative-count window chain in SQL."""
    from threat_intelligence_knowledge_graph_spark.operators.evaluation import (
        roc_auc,
    )

    return roc_auc(_auc_scored(spark, sf_dir), "p", "y")


def q_eval_pr_curve(spark, sf_dir):
    """Precision/recall/F1 operating-point table at 10 equal-width
    thresholds over the synthetic scorer — exact integer TP/FP/FN from
    descending bucket cumulation, one round-6 division per ratio."""
    from threat_intelligence_knowledge_graph_spark.operators.evaluation import (
        pr_curve,
    )

    return pr_curve(_auc_scored(spark, sf_dir), "p", "y", n_thresholds=10)


def q_events_ewma_hourly(spark, sf_dir):
    """Truncated dyadic EWMA (α=½, 8 lags) of per-type hourly volumes
    with the cnt/ewma surge ratio — every term and partial sum is an
    exactly-representable dyadic rational (integer count over a power
    of two), so the EWMA itself is bit-identical on both engines with
    NO fixed-point scaffolding; only the ratio rounds."""
    from threat_intelligence_knowledge_graph_spark.operators.anomaly import (
        ewma_surge,
    )

    ev = _t(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("event_type").isNotNull()
    )
    return ewma_surge(ev, "event_type", "ts", 3600, 8)


def q_events_simpson(spark, sf_dir):
    """Simpson concentration λ = Σcᵢ²/n² + inverse-Simpson effective
    state count per user — the entropy triage's no-log companion;
    both ratios are single round-6 divisions of exact integers."""
    from threat_intelligence_knowledge_graph_spark.operators.stats import (
        simpson_index,
    )

    ev = _t(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("event_type").isNotNull()
    )
    return simpson_index(ev, "user_id", "event_type")


def q_events_nearest_click(spark, sf_dir):
    """Nearest-event join (both directions, ±1 day tolerance): for each
    error event, the same user's click event closest in time — the
    single-exchange union-merge plan (backward last + forward first
    sharing one sort); equidistant resolves to the EARLIER click.
    Integer epoch arithmetic only — the operator emits no floats.
    Oracle: an INDEPENDENT brute-force per-user join + abs-gap argmin
    with the same (distance, earlier) tie order."""
    from threat_intelligence_knowledge_graph_spark.operators.temporal_join import (
        nearest_join,
    )

    ev = _t(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    )
    left = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    right = ev.filter(F.col("event_type") == "click").select("user_id", "ts")
    out = nearest_join(
        left,
        right,
        key="user_id",
        left_time="ts",
        right_time="ts",
        tolerance_seconds=86400,
    )
    return out.select(
        F.col("event_id").cast("long").alias("event_id"),
        F.col("user_id").cast("long").alias("user_id"),
        "left_epoch",
        "nearest_epoch",
        "gap_s",
    )


def q_dedup_soft_weights(spark, sf_dir):
    """SlimPajama-style soft-dedup sampling weights (1/family_size per
    md5 content class) over the planted replay corpus — every family's
    total mass is exactly 1; weight is the only division (round-6)."""
    from threat_intelligence_knowledge_graph_spark.operators.dedup import (
        soft_dedup_weights,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    k = F.col("doc_id")
    corpus = (
        d.unionByName(d.filter(k % 7 == 0))
        .unionByName(d.filter(k % 7 == 0))
        .unionByName(d.filter(k % 13 == 0))
    )
    return soft_dedup_weights(corpus)


def q_text_textrank(spark, sf_dir):
    """Corpus-level TextRank keywords over every 5th document: word
    co-occurrence graph (scan-local adjacent-pair generation) +
    3-step weighted PageRank, rank rounded to 9 BEFORE the top-20
    (rank DESC, term ASC) cut. Oracle: the identical unrolled
    weighted-PageRank arithmetic over a generate_series pair CTE —
    out-strengths are sums of INTEGER-valued doubles (exact in any
    order), so only the ~1e-17 contribution-sum noise differs,
    absorbed by round-9."""
    from threat_intelligence_knowledge_graph_spark.operators.text_quality import (
        textrank_keywords,
    )

    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    return textrank_keywords(d, iterations=3, damping=0.85, k=20)


def q_events_best_lag(spark, sf_dir):
    """Best-lag cross-correlation (±3 h) between event-type hourly
    series — the relay/lead-lag read lag-0 correlation can't make;
    dense-range universe, exact integer moments (y's re-computed per
    shifted window), one round-6 division, round-before-rank best-lag
    pick. Oracle: the identical dense-range moment algebra with the
    shifted join expressed independently as cb.bucket = ca.bucket+lag."""
    from threat_intelligence_knowledge_graph_spark.operators.stats import (
        best_lag_correlation,
    )

    return best_lag_correlation(
        _t(spark, sf_dir, "events"), max_lag=3, min_overlap=3
    )


def q_events_seasonal_surge(spark, sf_dir):
    """Seasonally-adjusted volume deviation: each (type, week,
    hour-of-week) cell vs the type's same-hour-of-week baseline across
    all weeks — pure epoch-integer calendar math (Thursday-aligned
    weeks, dow = (days+4) mod 7), exact integers, one round-6
    division."""
    from threat_intelligence_knowledge_graph_spark.operators.anomaly import (
        seasonal_surge,
    )

    return seasonal_surge(_t(spark, sf_dir, "events"))


def q_events_dp_counts(spark, sf_dir):
    """ε-DP (type, user) counts via the seeded Laplace mechanism
    (ε=0.5): md5 inverse-CDF noise makes the release a pure function
    of the input — reproducible and oracle-auditable; only the noisy
    column is emitted (the release posture)."""
    from threat_intelligence_knowledge_graph_spark.operators.quality_checks import (
        dp_noisy_counts,
    )

    ev = _t(spark, sf_dir, "events").filter(
        F.col("event_type").isNotNull() & F.col("user_id").isNotNull()
    )
    return dp_noisy_counts(ev, ["event_type", "user_id"], epsilon=0.5)


def q_transcript_refusals(spark, sf_dir):
    """Per-conversation assistant-refusal profile over the synthetic
    transcripts with PLANTED refusals (assistant turns where
    (conv + turn) % 5 == 0 get an 'I cannot help…' suffix): literal
    lowercase-contains matching (no regex seam), exact counts, one
    round-6 division."""
    from threat_intelligence_knowledge_graph_spark.operators.transcript_stats import (
        refusal_rate,
    )

    tr = _synth_transcripts(spark, sf_dir)
    planted = tr.withColumn(
        "text",
        F.when(
            (F.col("role") == "assistant")
            & ((F.col("conv_id").cast("long") + F.col("turn_idx")) % 5 == 0),
            F.concat(
                F.col("text"), F.lit(" I cannot help with that request.")
            ),
        ).otherwise(F.col("text")),
    )
    return refusal_rate(planted)


def q_sample_cluster_balanced(spark, sf_dir):
    """Diversity-balanced embedding sample: ≤ 8 rows per integer-grid
    k-means cluster by deterministic md5-priority draw — the
    embedding-space analog of mixture water-filling; assignment and
    draw are both bit-identical cross-engine (integer Lloyd + exact
    decimal md5 priority)."""
    from threat_intelligence_knowledge_graph_spark.operators.clustering import (
        cluster_balanced_sample,
    )

    return cluster_balanced_sample(
        _t(spark, sf_dir, "embeddings"), k=4, iterations=2, per_cluster=8
    )


def q_text_vocab_richness(spark, sf_dir):
    """Vocabulary-richness card (Chao1 + Good-Turing coverage) over
    every 5th document: exact integer term counts / hapax / dis
    legomena, bias-corrected Chao1 (f2+1 denominator — defined even
    when f2=0), one round-6 division per estimate."""
    from threat_intelligence_knowledge_graph_spark.operators.text_quality import (
        vocab_richness,
    )

    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    return vocab_richness(d)


_DRIFT_COLUMNS = ("user_id", "event_type", "value", "props")


def q_events_profile_drift(spark, sf_dir):
    """Schema-profile drift between the even/odd event_id halves of
    the events table (a synthetic two-batch split): per-column null
    rates, exact distinct counts, and their deltas — each emitted
    ratio one round-6 division. Oracle: per-column UNION ALL profile
    generated from the same column tuple."""
    from threat_intelligence_knowledge_graph_spark.operators.quality_checks import (
        profile_drift,
    )

    ev = _t(spark, sf_dir, "events")
    return profile_drift(
        ev.filter(F.col("event_id") % 2 == 0),
        ev.filter(F.col("event_id") % 2 == 1),
        list(_DRIFT_COLUMNS),
    )


def q_text_stylometry(spark, sf_dir):
    """Burrows' Delta between document sources over the corpus's top-30
    terms: millionth-fixed-point relative frequencies make the
    cross-source moments exact integers, each z one division over one
    IEEE sqrt, zero-variance terms excluded by an INTEGER test, mean
    rounds to 6 after the sum."""
    from threat_intelligence_knowledge_graph_spark.operators.text_quality import (
        stylometry_delta,
    )

    return stylometry_delta(_t(spark, sf_dir, "documents"), m=30)


def q_events_robust_trend(spark, sf_dir):
    """Mann-Kendall S/z + Theil-Sen median slope per event type over
    hourly volumes — exact integer S and ×18-scaled tie-corrected
    variance, one sqrt + one round-6 division for z; the Sen slope is
    a nearest-rank PICK (pair-key tiebreak) so the emitted value is a
    single division of one engine-stable chosen pair."""
    from threat_intelligence_knowledge_graph_spark.operators.stats import (
        robust_trend,
    )

    return robust_trend(_t(spark, sf_dir, "events"))


def q_events_ks_drift(spark, sf_dir):
    """Two-sample KS distance of the `value` distribution between the
    even/odd event_id halves: D's numerator |c_a·n_b − c_b·n_a| is an
    exact integer, so the max and its location are integer-argmax
    picks (value-ASC tiebreak) and D is ONE round-6 division."""
    from threat_intelligence_knowledge_graph_spark.operators.quality_checks import (
        ks_two_sample,
    )

    ev = _t(spark, sf_dir, "events")
    return ks_two_sample(
        ev.filter(F.col("event_id") % 2 == 0),
        ev.filter(F.col("event_id") % 2 == 1),
        "value",
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: construct CTI text from sf0.001, run the full extraction
    kernel, return the distinct triple set (SURVEY.md §7 flagship query)."""
    return q_kg_triples_from_kernel(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "kg_chunks": q_kg_chunks,
        "kg_node_ids": q_kg_node_ids,
        "kg_ioc_typing": q_kg_ioc_typing,
        "kg_cve_mentions": q_kg_cve_mentions,
        "kg_ipv4_mentions": q_kg_ipv4_mentions,
        "ioc_first_last_seen": q_ioc_first_last_seen,
        "kg_triples_from_kernel": q_kg_triples_from_kernel,
        "kg_llm_mock_triples": q_kg_llm_mock_triples,
        "kg_nodes_from_kernel": q_kg_nodes_from_kernel,
        "kg_edge_dedup": q_kg_edge_dedup,
        "kg_endpoint_semijoin": q_kg_endpoint_semijoin,
        "kg_degrees": q_kg_degrees,
        "kg_two_hop": q_kg_two_hop,
        "kg_metrics_rollup": q_kg_metrics_rollup,
        "tpch_q1": q_tpch_q1,
        "join_customer_orders": q_join_customer_orders,
        "events_user_windows": q_events_user_windows,
        "events_sessionize": q_events_sessionize,
        "events_type_cooccurrence": q_events_type_cooccurrence,
        "top_parts_by_revenue": q_top_parts_by_revenue,
        "set_ops_nations": q_set_ops_nations,
        "rollup_orders": q_rollup_orders,
        "pivot_order_status": q_pivot_order_status,
        "anti_join_orders": q_anti_join_orders,
        "events_hourly": q_events_hourly,
        "events_percentiles": q_events_percentiles,
        "events_extremes": q_events_extremes,
        "similarity_batch_topk": q_similarity_batch_topk,
        "hard_negatives": q_hard_negatives,
        "latest_event_per_user": q_latest_event_per_user,
        "asof_join_events_orders": q_asof_join_events_orders,
        "interval_join_events": q_interval_join_events,
        "dedup_exact_docs": q_dedup_exact_docs,
        "html_to_text": q_html_to_text,
        "multimodal_decode": q_multimodal_decode,
        "skew_hot_entities": q_skew_hot_entities,
        "pack_documents": q_pack_documents,
        "train_val_split": q_train_val_split,
        "text_token_counts": q_text_token_counts,
        "text_tfidf_top_terms": q_text_tfidf_top_terms,
        "text_quality_score": q_text_quality_score,
        "text_language_id": q_text_language_id,
        "text_fingerprints": q_text_fingerprints,
        "similarity_topk": q_similarity_topk,
        "minhash_near_dup_docs": q_minhash_near_dup_docs,
        "ngram_jaccard": q_ngram_jaccard,
        "ngram_containment": q_ngram_containment,
        "select_sources": q_select_sources,
        "source_overlap": q_source_overlap,
        "minhash_incremental": q_minhash_incremental,
        "minhash_dedup_survivors": q_minhash_dedup_survivors,
        "dedup_keep_best": q_dedup_keep_best,
        "canonical_map": q_canonical_map,
        "eval_triple_pr": q_eval_triple_pr,
        "eval_triple_pr_by_pred": q_eval_triple_pr_by_pred,
        "eval_cluster_pairwise": q_eval_cluster_pairwise,
        "simhash_near_dups": q_simhash_near_dups,
        "simhash_signatures": q_simhash_signatures,
        "similarity_lsh_topk": q_similarity_lsh_topk,
        "similarity_ivf_topk": q_similarity_ivf_topk,
        "embedding_near_dups": q_embedding_near_dups,
        "embedding_dedup_survivors": q_embedding_dedup_survivors,
        "ngram_decontaminate": q_ngram_decontaminate,
        "sample_stratified": q_sample_stratified,
        "graph_pagerank": q_graph_pagerank,
        "graph_pagerank_weighted": q_graph_pagerank_weighted,
        "graph_pagerank_personalized": q_graph_pagerank_personalized,
        "graph_pagerank_delta": q_graph_pagerank_delta,
        "graph_stats": q_graph_stats,
        "graph_kcore": q_graph_kcore,
        "graph_diameter": q_graph_diameter,
        "cypher_match_filter": q_cypher_match_filter,
        "cypher_two_hop_count": q_cypher_two_hop_count,
        "graph_ktruss": q_graph_ktruss,
        "graph_harmonic_closeness": q_graph_harmonic_closeness,
        "graph_sssp_weighted": q_graph_sssp_weighted,
        "graph_mst": q_graph_mst,
        "graph_single_linkage": q_graph_single_linkage,
        "graph_betweenness": q_graph_betweenness,
        "table_checks": q_table_checks,
        "curate_corpus": q_curate_corpus,
        "curate_increment": q_curate_increment,
        "graph_bfs_distances": q_graph_bfs_distances,
        "graph_anf": q_graph_anf,
        "graph_label_propagation": q_graph_label_propagation,
        "text_scrub_pii": q_text_scrub_pii,
        "text_repetition_ratio": q_text_repetition_ratio,
        "sample_mixture": q_sample_mixture,
        "split_oversized_docs": q_split_oversized_docs,
        "graph_connected_components": q_graph_connected_components,
        "graph_triangle_count": q_graph_triangle_count,
        "graph_node_similarity": q_graph_node_similarity,
        "graph_link_prediction": q_graph_link_prediction,
        "text_unigram_logprob": q_text_unigram_logprob,
        "text_bigram_logprob": q_text_bigram_logprob,
        "source_datasheet": q_source_datasheet,
        "dedup_bow": q_dedup_bow,
        "curriculum_order": q_curriculum_order,
        "jaccard_prefix_join": q_jaccard_prefix_join,
        "events_benford": q_events_benford,
        "search_ndcg": q_search_ndcg,
        "search_rank_eval": q_search_rank_eval,
        "text_readability": q_text_readability,
        "sample_weighted": q_sample_weighted,
        "events_seasonality": q_events_seasonality,
        "graph_transitivity": q_graph_transitivity,
        "graph_rich_club": q_graph_rich_club,
        "graph_avg_nbr_deg": q_graph_avg_nbr_deg,
        "events_k_anonymity": q_events_k_anonymity,
        "events_trimmed_mean": q_events_trimmed_mean,
        "events_l_diversity": q_events_l_diversity,
        "events_rate_peaks": q_events_rate_peaks,
        "hll_user_overlap": q_hll_user_overlap,
        "events_survival": q_events_survival,
        "events_value_pct": q_events_value_pct,
        "similarity_mutual_best": q_similarity_mutual_best,
        "eval_calibration": q_eval_calibration,
        "graph_degree_hist": q_graph_degree_hist,
        "graph_hill_tail": q_graph_hill_tail,
        "events_json_props": q_events_json_props,
        "dsir_weights": q_dsir_weights,
        "dsir_resample": q_dsir_resample,
        "cms_user_counts": q_cms_user_counts,
        "domain_registrable": q_domain_registrable,
        "bloom_prefilter": q_bloom_prefilter,
        "feature_hash": q_feature_hash,
        "quality_model_score": q_quality_model_score,
        "ip_cidr_enrich": q_ip_cidr_enrich,
        "graph_scc": q_graph_scc,
        "graph_random_walks": q_graph_random_walks,
        "graph_walk_pmi": q_graph_walk_pmi,
        "graph_hits": q_graph_hits,
        "graph_katz": q_graph_katz,
        "span_dup_stats": q_span_dup_stats,
        "span_scrub": q_span_scrub,
        "kmv_distinct_users": q_kmv_distinct_users,
        "hll_distinct_users": q_hll_distinct_users,
        "events_percentiles_exact": q_events_percentiles_exact,
        "embeddings_kmeans": q_embeddings_kmeans,
        "semantic_dedup": q_semantic_dedup,
        "transcript_stats": q_transcript_stats,
        "transcript_pii_audit": q_transcript_pii_audit,
        "transcript_latency": q_transcript_latency,
        "sft_pairs": q_sft_pairs,
        "conv_dedup_exact": q_conv_dedup_exact,
        "conv_near_dup": q_conv_near_dup,
        "validate_traces": q_validate_traces,
        "transcript_role_transitions": q_transcript_role_transitions,
        "embedding_decontaminate": q_embedding_decontaminate,
        "cypher_optional_match": q_cypher_optional_match,
        "cypher_var_length": q_cypher_var_length,
        "events_anomaly": q_events_anomaly,
        "similarity_sq_topk": q_similarity_sq_topk,
        "graph_louvain": q_graph_louvain,
        "graph_louvain_weighted": q_graph_louvain_weighted,
        "graph_modularity": q_graph_modularity,
        "kg_negative_samples": q_kg_negative_samples,
        "events_cooccur_npmi": q_events_cooccur_npmi,
        "graph_node2vec": q_graph_node2vec,
        "similarity_pq_topk": q_similarity_pq_topk,
        "sample_temperature": q_sample_temperature,
        "events_zorder_key": q_events_zorder,
        "graph_eigenvector": q_graph_eigenvector,
        "graph_cc_increment": q_graph_cc_increment,
        "url_normalize": q_url_normalize,
        "transcript_sessionize": q_transcript_sessionize,
        "sft_pairs_context": q_sft_pairs_context,
        "events_hist_quantiles": q_events_hist_quantiles,
        "events_recency_decay": q_events_recency_decay,
        "events_funnel": q_events_funnel,
        "events_retention": q_events_retention,
        "corpus_kl": q_corpus_kl,
        "graph_conductance": q_graph_conductance,
        "events_mad_outliers": q_events_mad_outliers,
        "quality_gate": q_quality_gate,
        "cms_join_size": q_cms_join_size,
        "graph_lcc": q_graph_lcc,
        "events_cusum": q_events_cusum,
        "text_bm25_search": q_text_bm25_search,
        "text_blocklist": q_text_blocklist,
        "search_rrf": q_search_rrf,
        "text_ttr": q_text_ttr,
        "events_burstiness": q_events_burstiness,
        "events_dormancy": q_events_dormancy,
        "events_entropy": q_events_entropy,
        "events_correlation": q_events_correlation,
        "events_trend": q_events_trend,
        "events_novelty": q_events_novelty,
        "events_autocorr": q_events_autocorr,
        "events_churn": q_events_churn,
        "events_beacons": q_events_beacons,
        "corpus_source_gini": q_corpus_source_gini,
        "events_top_sequences": q_events_top_sequences,
        "graph_reciprocity": q_graph_reciprocity,
        "events_markov": q_events_markov,
        "corpus_top_ngrams": q_corpus_top_ngrams,
        "vocab_prune": q_vocab_prune,
        "vocab_growth": q_vocab_growth,
        "bpe_train": q_bpe_train,
        "bpe_token_counts": q_bpe_token_counts,
        "transcript_tool_profile": q_transcript_tool_profile,
        "transcript_loops": q_transcript_loops,
        "curate_transcripts": q_curate_transcripts,
        "curate_transcripts_increment": q_curate_transcripts_increment,
        "line_dedup": q_line_dedup,
        "transcript_outcomes": q_transcript_outcomes,
        "dpo_pairs": q_dpo_pairs,
        "best_of_n_pairs": q_best_of_n_pairs,
        "graph_assortativity": q_graph_assortativity,
        "similarity_mmr": q_similarity_mmr,
        "corpus_fertility": q_corpus_fertility,
        "dedup_family_sizes": q_dedup_family_sizes,
        "gopher_rules": q_gopher_rules,
        "stix_objects": q_stix_objects,
        "stix_relationships": q_stix_relationships,
        "watchlist_alerts": q_watchlist_alerts,
        "watchlist_summary": q_watchlist_summary,
        "transcript_context_growth": q_transcript_context_growth,
        "transcript_tool_errors": q_transcript_tool_errors,
        "transcript_tool_chains": q_transcript_tool_chains,
        "dedup_paragraphs": q_dedup_paragraphs,
        "er_sorted_neighborhood": q_er_sorted_neighborhood,
        "kg_schema_audit": q_kg_schema_audit,
        "kg_scd2_intervals": q_kg_scd2_intervals,
        "er_verified_matches": q_er_verified_matches,
        "kg_temporal_two_hop": q_kg_temporal_two_hop,
        "kg_corroboration": q_kg_corroboration,
        "eval_roc_auc": q_eval_roc_auc,
        "eval_pr_curve": q_eval_pr_curve,
        "events_ewma_hourly": q_events_ewma_hourly,
        "events_simpson": q_events_simpson,
        "events_nearest_click": q_events_nearest_click,
        "dedup_soft_weights": q_dedup_soft_weights,
        "text_textrank": q_text_textrank,
        "events_best_lag": q_events_best_lag,
        "events_seasonal_surge": q_events_seasonal_surge,
        "events_dp_counts": q_events_dp_counts,
        "transcript_refusals": q_transcript_refusals,
        "sample_cluster_balanced": q_sample_cluster_balanced,
        "text_vocab_richness": q_text_vocab_richness,
        "events_profile_drift": q_events_profile_drift,
        "text_stylometry": q_text_stylometry,
        "events_robust_trend": q_events_robust_trend,
        "events_ks_drift": q_events_ks_drift,
    }


def _bpe_vocab_chain_sql(k: int) -> str:
    """The unrolled BPE merge recurrence as a WITH-clause body (no
    leading WITH): v0 is the delimiter-wrapped word vocabulary, each
    step i computes pair counts p{i}, the deterministic argmax b{i}
    (cnt DESC, left ASC, right ASC), and the rewritten vocab v{i} via
    the engine's native left-to-right all-occurrence replace — the
    per-token double-U+001F wrapping makes adjacent matches disjoint,
    so replace() IS the greedy BPE merge (operators/bpe.py docstring).
    Shared by the bpe_train and bpe_token_counts oracles."""
    sep = "\x1f"
    parts = [
        f"""
            v0 AS (
              SELECT word, cast(count(*) AS bigint) AS freq,
                     regexp_replace(word, '(.)', '{sep}\\1{sep}', 'g') AS s
              FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z]+'))
                      AS word FROM documents)
              GROUP BY word
            )"""
    ]
    for i in range(1, k + 1):
        parts.append(
            f"""
            p{i} AS (
              SELECT tok[i] AS l, tok[i + 1] AS r,
                     cast(sum(freq) AS bigint) AS cnt
              FROM (SELECT freq,
                           string_split(trim(s, '{sep}'), '{sep}{sep}') AS tok
                    FROM v{i - 1}),
                   unnest(range(1, len(tok))) AS u(i)
              GROUP BY 1, 2
            ),
            b{i} AS (SELECT l, r, cnt FROM p{i}
                     ORDER BY cnt DESC, l ASC, r ASC LIMIT 1),
            v{i} AS (
              SELECT v.word, v.freq,
                     replace(v.s, '{sep}' || b.l || '{sep}{sep}' || b.r || '{sep}',
                                  '{sep}' || b.l || b.r || '{sep}') AS s
              FROM v{i - 1} v CROSS JOIN b{i} b
            )"""
        )
    return ",".join(parts)


def _bpe_train_oracle_sql(k: int) -> str:
    """Merge-rule table oracle (see q_bpe_train)."""
    union = " UNION ALL ".join(
        f"SELECT {i} AS step, l, r, cnt FROM b{i}" for i in range(1, k + 1)
    )
    return f"""
        WITH {_bpe_vocab_chain_sql(k)}
        SELECT cast(step AS int) AS step, l AS left_sym, r AS right_sym, cnt
        FROM ({union}) ORDER BY step
    """


def _bpe_token_counts_oracle_sql(k: int) -> str:
    """Per-doc tokenization oracle over the trained vocab
    (see q_bpe_token_counts); INNER join drops wordless docs."""
    sep = "\x1f"
    return f"""
        WITH {_bpe_vocab_chain_sql(k)},
        per_word AS (
          SELECT word,
                 cast(len(string_split(trim(s, '{sep}'), '{sep}{sep}'))
                   AS bigint) AS n_tok,
                 cast(length(word) AS bigint) AS n_chr
          FROM v{k}
        ),
        dw AS (
          SELECT doc_id, word, cast(count(*) AS bigint) AS n
          FROM (SELECT doc_id,
                       unnest(regexp_extract_all(lower(text), '[a-z]+'))
                         AS word FROM documents)
          GROUP BY 1, 2
        )
        SELECT dw.doc_id,
               cast(sum(dw.n * pw.n_chr) AS bigint) AS n_chars,
               cast(sum(dw.n * pw.n_tok) AS bigint) AS n_tokens,
               round(sum(dw.n * pw.n_tok) / sum(dw.n * pw.n_chr), 6)
                 AS compression
        FROM dw JOIN per_word pw USING (word)
        GROUP BY dw.doc_id
    """


def _bm25_oracle_sql(terms: list[str], k: int = 20) -> str:
    """Okapi BM25 top-k oracle (see q_text_bm25_search): the same float
    expression shape as operators/text_quality.py::bm25_search, round-6
    before the (score DESC, doc_id ASC) rank. Returned as a standalone
    query so rank-fusion oracles can nest it as a derived table."""
    terms_sql = ", ".join(f"'{t}'" for t in sorted(set(terms)))
    return f"""
            WITH b2 AS (
              SELECT doc_id,
                     cast(len(regexp_extract_all(lower(text), '[a-z0-9]{{2,}}'))
                       AS bigint) AS dl,
                     regexp_extract_all(lower(text), '[a-z0-9]{{2,}}') AS toks
              FROM documents
            ),
            consts AS (
              SELECT cast(count(*) AS bigint) AS n,
                     cast(sum(dl) AS bigint) AS tdl
              FROM b2
            ),
            tf AS (
              SELECT doc_id, dl, term, cast(count(*) AS bigint) AS tf
              FROM (
                SELECT doc_id, dl,
                       unnest(list_filter(toks,
                         t -> list_contains([{terms_sql}], t)))
                         AS term
                FROM b2
              ) GROUP BY 1, 2, 3
            ),
            dfr AS (SELECT term, cast(count(*) AS bigint) AS df FROM tf GROUP BY term),
            contrib AS (
              SELECT tf.doc_id,
                     ln(1.0 + (n - df + 0.5) / (df + 0.5))
                       * (tf * 2.2)
                       / (tf + 1.2 * (0.25 + 0.75 * (dl * n) / tdl)) AS c
              FROM tf JOIN dfr USING (term) CROSS JOIN consts
            ),
            scored AS (
              SELECT doc_id, round(sum(c), 6) AS score
              FROM contrib GROUP BY doc_id
            )
            SELECT doc_id, score, cast(rk AS int) AS rk FROM (
              SELECT *, row_number() OVER (
                ORDER BY score DESC, doc_id ASC
              ) AS rk FROM scored
            ) WHERE rk <= {k}
    """


def _lpa_oracle_sql(iterations: int) -> str:
    """Unrolled synchronous LPA over the planted 4-clique forest (see
    q_graph_label_propagation): per iteration the identical neighbor-
    label count + (max count, min label) argmax, as a window QUALIFY."""
    parts = [
        """
        WITH ks AS (SELECT o_orderkey AS k FROM orders WHERE o_orderkey % 17 = 0),
        e0 AS (
          SELECT 4 * k + i.a AS s, 4 * k + i.b AS d
          FROM ks CROSS JOIN (VALUES (0,1),(0,2),(0,3),(1,2),(1,3),(2,3)) i(a, b)
        ),
        sym AS (SELECT s AS u, d AS v FROM e0 UNION SELECT d, s FROM e0),
        l0 AS (SELECT DISTINCT u AS id, u AS label FROM sym)
        """
    ]
    for i in range(1, iterations + 1):
        parts.append(
            f""",
        f{i} AS (
          SELECT sym.u, l{i - 1}.label, count(*) AS cnt
          FROM sym JOIN l{i - 1} ON sym.v = l{i - 1}.id
          GROUP BY sym.u, l{i - 1}.label
        ),
        l{i} AS (
          SELECT u AS id, label FROM f{i}
          QUALIFY row_number() OVER (
            PARTITION BY u ORDER BY cnt DESC, label ASC) = 1
        )
        """
        )
    parts.append(
        f"""
        SELECT cast(id AS bigint) AS id, cast(label AS bigint) AS label
        FROM l{iterations}
        """
    )
    return "".join(parts)


# Shared head for the span-dedup oracles: positional 6-gram md5s over
# the engine-portable tokenization, corpus-duplicated (occ >= 2) gram
# occurrences as (doc_id, pos). Mirrors operators/span_dedup.py exactly
# (1-based positions, within-doc repeats count).
_SPAN_PG_SQL = r"""
            WITH base AS (
              SELECT doc_id,
                     regexp_split_to_array(trim(lower(text)), '\s+') AS t
              FROM documents
            ),
            b2 AS (SELECT doc_id, t, len(t) AS n_tokens FROM base),
            pos AS (
              SELECT doc_id, t,
                     unnest(generate_series(1, cast(n_tokens AS int) - 5)) AS pos
              FROM b2
            ),
            pg AS (
              SELECT doc_id, pos,
                     md5(array_to_string(t[pos:pos+5], ' ')) AS g
              FROM pos
            ),
            occ AS (SELECT g FROM pg GROUP BY g HAVING count(*) >= 2),
            dup AS (SELECT pg.doc_id, pg.pos FROM pg JOIN occ USING (g))
"""


def _katz_oracle_sql(
    iterations: int, alpha: float = 0.1, beta: float = 1.0
) -> str:
    """Unrolled truncated-Katz recurrence over the planted nation
    graph (see q_graph_katz). Mirrors graph_algos.katz_centrality
    exactly: x0 ≡ β, then per iteration a src-keyed sum of the previous
    vector along in-edges, zero-coalesced over the full node set, then
    the affine map α·s + β. Pure exactly-rounded IEEE arithmetic; the
    final round-6 absorbs summation-order noise (~1e-16)."""
    parts = [
        """
        WITH e0 AS (
          SELECT 'n' || cast(n_nationkey AS varchar) AS src,
                 'n' || cast((n_nationkey + 1) % 25 AS varchar) AS dst
          FROM nation
          UNION ALL
          SELECT 'n' || cast(n_nationkey AS varchar),
                 'r' || cast(n_regionkey AS varchar)
          FROM nation
        ),
        e AS (SELECT DISTINCT src, dst FROM e0),
        nodes AS (SELECT src AS id FROM e UNION SELECT dst AS id FROM e),
        """
        + f"x0 AS (SELECT id, cast({beta!r} AS double) AS x FROM nodes)"
    ]
    for i in range(1, iterations + 1):
        parts.append(
            f""",
        s{i} AS (
          SELECT e.dst AS id, sum(x.x) AS s
          FROM e JOIN x{i - 1} x ON e.src = x.id GROUP BY e.dst
        ),
        x{i} AS (
          SELECT nd.id,
                 cast({alpha!r} AS double)
                   * coalesce(s.s, cast(0.0 AS double))
                 + cast({beta!r} AS double) AS x
          FROM nodes nd LEFT JOIN s{i} s ON s.id = nd.id
        )"""
        )
    parts.append(
        f"""
        SELECT id AS node_id, round(x, 6) AS katz FROM x{iterations}
        """
    )
    return "".join(parts)


def _eigenvector_oracle_sql(iterations: int) -> str:
    """Unrolled eigenvector-centrality power iteration over the planted
    nation graph (see q_graph_eigenvector): per step the in-edge pull
    sum, zero-coalesced over the full node set, L2-normalized — the
    authority half of _hits_oracle_sql iterated alone."""
    parts = [
        """
        WITH e0 AS (
          SELECT 'n' || cast(n_nationkey AS varchar) AS src,
                 'n' || cast((n_nationkey + 1) % 25 AS varchar) AS dst
          FROM nation
          UNION ALL
          SELECT 'n' || cast(n_nationkey AS varchar),
                 'r' || cast(n_regionkey AS varchar)
          FROM nation
        ),
        e AS (SELECT DISTINCT src, dst FROM e0),
        nodes AS (SELECT src AS id FROM e UNION SELECT dst AS id FROM e),
        x0 AS (SELECT id, cast(1.0 AS double) AS score FROM nodes)
        """
    ]
    for i in range(1, iterations + 1):
        parts.append(
            f""",
        xr{i} AS (
          SELECT e.dst AS id, sum(x.score) AS s
          FROM e JOIN x{i - 1} x ON e.src = x.id GROUP BY e.dst
        ),
        xf{i} AS (
          SELECT nd.id, coalesce(xr.s, cast(0.0 AS double)) AS s
          FROM nodes nd LEFT JOIN xr{i} xr ON xr.id = nd.id
        ),
        xn{i} AS (SELECT sqrt(sum(s * s)) AS nrm FROM xf{i}),
        x{i} AS (
          SELECT xf.id, xf.s / xn.nrm AS score
          FROM xf{i} xf CROSS JOIN xn{i} xn
        )"""
        )
    parts.append(
        f"""
        SELECT id, round(score, 9) AS score FROM x{iterations}
        """
    )
    return "".join(parts)


def _hits_oracle_sql(iterations: int) -> str:
    """Unrolled HITS recurrence over the planted nation graph (see
    q_graph_hits). Mirrors operators/hits.py exactly: per iteration an
    authority half-step (sum of PREVIOUS hubs along in-edges, zero-
    coalesced over the full node set, L2-normalized), then a hub
    half-step reading the JUST-normalized authority vector. sqrt and /
    are exactly-rounded IEEE ops, so 9-decimal rounding absorbs the
    only divergence (summation order, ~1e-16)."""
    parts = [
        """
        WITH e0 AS (
          SELECT 'n' || cast(n_nationkey AS varchar) AS src,
                 'n' || cast((n_nationkey + 1) % 25 AS varchar) AS dst
          FROM nation
          UNION ALL
          SELECT 'n' || cast(n_nationkey AS varchar),
                 'r' || cast(n_regionkey AS varchar)
          FROM nation
        ),
        e AS (SELECT DISTINCT src, dst FROM e0),
        nodes AS (SELECT src AS id FROM e UNION SELECT dst AS id FROM e),
        h0 AS (SELECT id, cast(1.0 AS double) AS hub FROM nodes)
        """
    ]
    for i in range(1, iterations + 1):
        parts.append(
            f""",
        ar{i} AS (
          SELECT e.dst AS id, sum(h.hub) AS a
          FROM e JOIN h{i - 1} h ON e.src = h.id GROUP BY e.dst
        ),
        af{i} AS (
          SELECT nd.id, coalesce(ar.a, cast(0.0 AS double)) AS a
          FROM nodes nd LEFT JOIN ar{i} ar ON ar.id = nd.id
        ),
        an{i} AS (SELECT sqrt(sum(a * a)) AS nrm FROM af{i}),
        a{i} AS (
          SELECT af.id, af.a / an.nrm AS auth
          FROM af{i} af CROSS JOIN an{i} an
        ),
        hr{i} AS (
          SELECT e.src AS id, sum(a.auth) AS h
          FROM e JOIN a{i} a ON e.dst = a.id GROUP BY e.src
        ),
        hf{i} AS (
          SELECT nd.id, coalesce(hr.h, cast(0.0 AS double)) AS h
          FROM nodes nd LEFT JOIN hr{i} hr ON hr.id = nd.id
        ),
        hn{i} AS (SELECT sqrt(sum(h * h)) AS nrm FROM hf{i}),
        h{i} AS (
          SELECT hf.id, hf.h / hn.nrm AS hub
          FROM hf{i} hf CROSS JOIN hn{i} hn
        )
            """
        )
    parts.append(
        f"""
        SELECT h.id, round(h.hub, 9) AS hub, round(a.auth, 9) AS auth
        FROM h{iterations} h JOIN a{iterations} a ON a.id = h.id
        """
    )
    return "".join(parts)


def _louvain_oracle_sql(iterations: int, weighted: bool = False) -> str:
    """Unrolled synchronous-Louvain recurrence over the planted nation
    barbell (see q_graph_louvain). Mirrors operators/louvain.py
    exactly per round: community volumes, per-(node, community) edge
    counts with the own-community kin-0 floor, the ΔQ-numerator score
    (integer arithmetic + one exactly-rounded division, rounded to 9),
    the round-parity direction gate (even round index: smaller ids
    only; odd: larger only), argmax (score DESC, comm ASC), and the
    strict-improvement move condition (NULL best → stay, matching
    Spark's when/otherwise).

    ``weighted=True`` plants integer edge weights ((a.k+b.k)%3+1 on
    clique edges, 7 on the bridge — heavy enough that n11/n12 behave
    differently than unweighted) and swaps every count for the weight
    sum (kin, degrees, volumes, 2m) — the GDS
    relationshipWeightProperty semantics; integer weights keep the
    recurrence float-exact."""
    if weighted:
        head = """
        WITH nk AS (
          SELECT n_nationkey AS k FROM nation WHERE n_nationkey < 24
        ),
        e0 AS (
          SELECT 'n' || cast(a.k AS varchar) AS s,
                 'n' || cast(b.k AS varchar) AS d,
                 cast((a.k + b.k) % 3 + 1 AS double) AS w
          FROM nk a JOIN nk b
            ON a.k < b.k AND floor(a.k / 12) = floor(b.k / 12)
          UNION ALL
          SELECT 'n11', 'n12', cast(7 AS double) FROM nk WHERE k = 11
        ),
        sym AS MATERIALIZED (
          -- planted pairs are unique, so UNION ALL mirrors the
          -- operator's groupBy-SUM merge exactly
          SELECT s AS u, d AS v, w FROM e0 WHERE s <> d
          UNION ALL
          SELECT d, s, w FROM e0 WHERE s <> d
        ),
        nodes AS (SELECT s AS id FROM e0 UNION SELECT d FROM e0),
        m2 AS (SELECT cast(sum(w) AS double) AS m2 FROM sym),
        degs AS MATERIALIZED (SELECT u AS id, sum(w) AS deg FROM sym GROUP BY u),
        c0 AS MATERIALIZED (SELECT id, id AS c FROM nodes)
        """
    else:
        head = """
        WITH nk AS (
          SELECT n_nationkey AS k FROM nation WHERE n_nationkey < 24
        ),
        e0 AS (
          SELECT 'n' || cast(a.k AS varchar) AS s,
                 'n' || cast(b.k AS varchar) AS d
          FROM nk a JOIN nk b
            ON a.k < b.k AND floor(a.k / 12) = floor(b.k / 12)
          UNION ALL
          SELECT 'n11', 'n12' FROM nk WHERE k = 11
        ),
        sym0 AS (
          SELECT s AS u, d AS v FROM e0 WHERE s <> d
          UNION
          SELECT d, s FROM e0 WHERE s <> d
        ),
        sym AS MATERIALIZED (SELECT u, v, cast(1 AS double) AS w FROM sym0),
        nodes AS (SELECT s AS id FROM e0 UNION SELECT d FROM e0),
        m2 AS (SELECT cast(sum(w) AS double) AS m2 FROM sym),
        degs AS MATERIALIZED (SELECT u AS id, sum(w) AS deg FROM sym GROUP BY u),
        c0 AS MATERIALIZED (SELECT id, id AS c FROM nodes)
        """
    parts = [head]
    for i in range(1, iterations + 1):
        gate = "<" if (i - 1) % 2 == 0 else ">"
        parts.append(
            f""",
        vol{i} AS MATERIALIZED (
          SELECT c.c AS comm, sum(coalesce(d.deg, 0)) AS vol
          FROM c{i - 1} c LEFT JOIN degs d ON d.id = c.id GROUP BY c.c
        ),
        kin{i} AS MATERIALIZED (
          SELECT s.u, cv.c AS comm, sum(s.w) AS kin
          FROM sym s JOIN c{i - 1} cv ON s.v = cv.id GROUP BY s.u, cv.c
        ),
        own{i} AS MATERIALIZED (
          SELECT c.id AS u, c.c AS own_c, coalesce(d.deg, 0) AS deg
          FROM c{i - 1} c LEFT JOIN degs d ON d.id = c.id
        ),
        cand{i} AS MATERIALIZED (
          SELECT u, comm, max(kin) AS kin FROM (
            SELECT u, comm, kin FROM kin{i}
            UNION ALL
            SELECT u, own_c AS comm, 0 AS kin FROM own{i}
          ) GROUP BY u, comm
        ),
        sc{i} AS MATERIALIZED (
          SELECT cand.u, cand.comm, own.own_c,
                 round(cand.kin
                       - own.deg * (vol.vol - CASE WHEN cand.comm = own.own_c
                                                   THEN own.deg ELSE 0 END)
                         / m2.m2, 9) AS score
          FROM cand{i} cand
          JOIN own{i} own ON own.u = cand.u
          JOIN vol{i} vol ON vol.comm = cand.comm
          CROSS JOIN m2
        ),
        best{i} AS MATERIALIZED (
          SELECT u, comm AS best, score AS bscore FROM sc{i}
          WHERE comm {gate} own_c
          QUALIFY row_number() OVER (
            PARTITION BY u ORDER BY score DESC, comm ASC) = 1
        ),
        c{i} AS MATERIALIZED (
          SELECT o.u AS id,
                 CASE WHEN b.bscore > so.score THEN b.best
                      ELSE o.own_c END AS c
          FROM own{i} o
          LEFT JOIN best{i} b ON b.u = o.u
          LEFT JOIN sc{i} so ON so.u = o.u AND so.comm = o.own_c
        )
            """
        )
    parts.append(f"SELECT id, c AS community FROM c{iterations}")
    return "".join(parts)


def _modularity_oracle_sql(iterations: int) -> str:
    """Newman modularity Q of the unrolled Louvain partition (see
    _louvain_oracle_sql): Q = Σ_C (dp_C/2m − (vol_C/2m)²) with
    dp_C the directed intra-community pair count — the exact float
    expression of operators/louvain.py::modularity, rounded to 9."""
    chain = _louvain_oracle_sql(iterations)
    head = chain[: chain.rindex("SELECT id, c AS community")]
    return (
        head
        + f""",
        dpq AS MATERIALIZED (
          SELECT cu.c, count(*) AS dp
          FROM sym s
          JOIN c{iterations} cu ON s.u = cu.id
          JOIN c{iterations} cv ON s.v = cv.id
          WHERE cu.c = cv.c GROUP BY cu.c
        ),
        volq AS MATERIALIZED (
          SELECT c.c, sum(coalesce(d.deg, 0)) AS vol
          FROM c{iterations} c LEFT JOIN degs d ON d.id = c.id GROUP BY c.c
        )
        SELECT round(sum(coalesce(dp, 0) / m2.m2
                         - (vol / m2.m2) * (vol / m2.m2)), 9) AS modularity
        FROM volq LEFT JOIN dpq USING (c) CROSS JOIN m2
        """
    )


def _walks_cte_sql(walk_length: int = 4, walks_per_node: int = 2) -> str:
    """WITH-clause prefix ending in relation ``walks(walk_id, start_id,
    step, node)`` — the unrolled md5-argmin walk over the symmetrized
    chain+region graph (the q_graph_random_walks recurrence, shared by
    the walk-PMI oracle). Caller appends its own final SELECT."""
    js = ",".join(f"({j})" for j in range(walks_per_node))
    steps, prev = [], "w"
    for i in range(1, walk_length + 1):
        steps.append(f"""
            s{i} AS (
              SELECT walk_id, start_id,
                     arg_min(v, md5(walk_id || '|{i}|' || v)) AS node
              FROM {prev} JOIN e ON e.u = {prev}.node
              GROUP BY walk_id, start_id
            )""")
        prev = f"s{i}"
    union = "\n".join(
        f"              UNION ALL"
        f" SELECT walk_id, start_id, {i} AS step, node FROM s{i}"
        for i in range(1, walk_length + 1)
    )
    return f"""
            WITH e0 AS ({_CHAIN_REGION_EDGES_SQL}),
            e AS (
              SELECT src AS u, dst AS v FROM e0
              UNION
              SELECT dst, src FROM e0
            ),
            nodes AS (SELECT u AS id FROM e UNION SELECT v FROM e),
            w AS (
              SELECT id || '#' || cast(j AS varchar) AS walk_id,
                     id AS start_id, id AS node
              FROM nodes CROSS JOIN (VALUES {js}) t(j)
            ),{",".join(steps)},
            walks AS (
              SELECT walk_id, start_id, 0 AS step, node FROM w
{union}
            )"""


def _node2vec_cte_sql(
    walk_length: int, walks_per_node: int, p: float, q: float
) -> str:
    """WITH-clause prefix ending in relation ``walks(walk_id, start_id,
    step, node)`` — the unrolled exponential-race node2vec walk over the
    symmetrized chain+region graph (see q_graph_node2vec). Per step:
    the identical md5-seeded clock round(−ln((b+0.5)/10⁶)·w, 9) with
    the prev/dist-1/dist-2 CASE, total-ordered by (clock, candidate)."""
    js = ",".join(f"({j})" for j in range(walks_per_node))
    steps, prev = [], "w"
    for i in range(1, walk_length + 1):
        steps.append(f"""
            s{i} AS (
              SELECT walk_id, start_id, prev, node FROM (
                SELECT c.walk_id, c.start_id, c.node AS prev,
                       c.x AS node,
                       row_number() OVER (
                         PARTITION BY c.walk_id
                         ORDER BY round(
                           -ln((md5_number_upper('n2v:' || c.walk_id
                                  || '|{i}|' || c.x) % 1000000 + 0.5)
                               / 1000000.0)
                           * (CASE WHEN c.prev IS NULL THEN 1.0
                                   WHEN c.x = c.prev THEN {p!r}
                                   WHEN a.a_u IS NOT NULL THEN 1.0
                                   ELSE {q!r} END), 9) ASC,
                           c.x ASC
                       ) AS rn
                FROM (
                  SELECT s.walk_id, s.start_id, s.prev, s.node, e.v AS x
                  FROM {prev} s JOIN e ON e.u = s.node
                ) c
                LEFT JOIN (SELECT u AS a_u, v AS a_v FROM e) a
                  ON a.a_u = c.prev AND a.a_v = c.x
              ) WHERE rn = 1
            )""")
        prev = f"s{i}"
    union = "\n".join(
        f"              UNION ALL"
        f" SELECT walk_id, start_id, {i} AS step, node FROM s{i}"
        for i in range(1, walk_length + 1)
    )
    return f"""
            WITH e0 AS ({_CHAIN_REGION_EDGES_SQL}),
            e AS (
              SELECT src AS u, dst AS v FROM e0
              UNION
              SELECT dst, src FROM e0
            ),
            nodes AS (SELECT u AS id FROM e UNION SELECT v FROM e),
            w AS (
              SELECT id || '#' || cast(j AS varchar) AS walk_id,
                     id AS start_id, cast(NULL AS varchar) AS prev,
                     id AS node
              FROM nodes CROSS JOIN (VALUES {js}) t(j)
            ),{",".join(steps)},
            walks AS (
              SELECT walk_id, start_id, 0 AS step, node FROM w
{union}
            )"""


def _dsir_weights_sql(dim: int = 512) -> str:
    """WITH-clause prefix ending in relation ``w(doc_id, n_feats,
    log_weight)`` — the DSIR smoothed log-likelihood-ratio weights over
    hashed unigram+bigram features (target = src0 docs, raw = all
    docs). Caller appends its own final SELECT. Mirrors
    ``operators/dsir.py``: same md5 'dsir:' bucketing, every ln on an
    exact integer, round-6 after the per-doc sum."""
    return f"""
            WITH rtoks AS (
              SELECT doc_id,
                     regexp_extract_all(lower(text), '[a-z0-9]{{2,}}') AS l
              FROM documents
            ),
            rfeat AS (
              SELECT doc_id, unnest(l) AS feat FROM rtoks
              UNION ALL
              SELECT doc_id, l[i] || ' ' || l[i+1] AS feat FROM (
                SELECT doc_id, l,
                       unnest(generate_series(1, len(l) - 1)) AS i
                FROM rtoks
              )
            ),
            tfeat AS (
              SELECT feat FROM rfeat
              JOIN documents USING (doc_id) WHERE source = 'src0'
            ),
            tf AS (
              SELECT doc_id,
                     cast(md5_number_upper('dsir:' || feat) % {dim}
                          AS bigint) AS bucket,
                     count(*) AS n
              FROM rfeat GROUP BY 1, 2
            ),
            p AS (
              SELECT cast(md5_number_upper('dsir:' || feat) % {dim}
                          AS bigint) AS bucket,
                     count(*) AS ct_p
              FROM tfeat GROUP BY 1
            ),
            q AS (SELECT bucket, sum(n) AS ct_q FROM tf GROUP BY 1),
            pt AS (SELECT coalesce(sum(ct_p), 0) AS p_total FROM p),
            qt AS (SELECT coalesce(sum(ct_q), 0) AS q_total FROM q),
            w AS (
              SELECT tf.doc_id,
                     cast(sum(tf.n) AS bigint) AS n_feats,
                     round(sum(tf.n * (ln(coalesce(p.ct_p, 0) + 1.0)
                                       - ln(q.ct_q + 1.0)))
                           + sum(tf.n) * any_value(ln(qt.q_total + {dim})
                                                   - ln(pt.p_total + {dim})),
                           6) AS log_weight
              FROM tf LEFT JOIN p USING (bucket) JOIN q USING (bucket)
              CROSS JOIN pt CROSS JOIN qt
              GROUP BY tf.doc_id
            )"""


def _pii_oracle_sql() -> str:
    """regexp_replace chain generated from the operator's PII_PATTERNS
    (same strings, same order) — RE2-safe by construction."""
    from threat_intelligence_knowledge_graph_spark.operators.text_quality import (
        PII_PATTERNS,
    )

    expr = "text"
    for pat, repl in PII_PATTERNS:
        expr = f"regexp_replace({expr}, '{pat}', '{repl}', 'g')"
    return f"SELECT doc_id, {expr} AS text FROM documents"


def _kcore_oracle_sql(k: int, iterations: int) -> str:
    """Unrolled synchronous k-core peeling over the planted chain +
    region graph (see q_graph_kcore). Each round recomputes degrees
    over the surviving node set and drops nodes with degree < k; the
    update is set-valued and deterministic, so iterations past the
    fixpoint are no-ops — the oracle just unrolls enough rounds to
    cover the planted graph's 15-round peel depth. The final SELECT
    reads the last round's degree frame (at fixpoint that IS the
    in-core degree, matching the operator's converged recompute)."""
    head = f"""
        WITH e0 AS ({_CHAIN_REGION_EDGES_SQL}),
        e AS (
          SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
          FROM e0 WHERE src <> dst
        ),
        sym AS MATERIALIZED (
          SELECT a AS id, b AS other FROM e
          UNION ALL
          SELECT b AS id, a AS other FROM e
        ),
        alive0 AS MATERIALIZED (SELECT DISTINCT id FROM sym)
        """
    parts = [head]
    for i in range(1, iterations + 1):
        parts.append(
            f""",
        deg{i} AS (
          SELECT s.id, count(*) AS c
          FROM sym s
          JOIN alive{i - 1} p ON s.id = p.id
          JOIN alive{i - 1} q ON s.other = q.id
          GROUP BY s.id
        ),
        alive{i} AS MATERIALIZED (SELECT id FROM deg{i} WHERE c >= {k})
            """
        )
    parts.append(
        f"SELECT id, cast(c AS integer) AS degree "
        f"FROM deg{iterations} WHERE c >= {k}"
    )
    return "".join(parts)


def _ktruss_oracle_sql(k: int, iterations: int) -> str:
    """Unrolled synchronous k-truss edge-peeling over the planted
    cascade gadgets (see q_graph_ktruss / _truss_gadget_edges). Each
    round recomputes every surviving edge's triangle support via the
    wedge self-join closed by an edge equi-join, LEFT-joins it back so
    triangle-free edges read support 0, and drops edges with support
    < k−2; the update is set-valued and deterministic, so iterations
    past the fixpoint are no-ops. The final SELECT reads the last
    round's support frame — at fixpoint that IS the in-truss support,
    matching the operator's converged recompute."""
    head = """
        WITH o AS (
          SELECT o_orderkey AS kk FROM orders WHERE o_orderkey % 29 = 0
        ),
        e0 AS (
          SELECT 'g'||kk||'_'||x AS src, 'g'||kk||'_'||y AS dst
          FROM o CROSS JOIN (VALUES
            (0,1),(0,2),(0,3),(1,2),(1,3),(2,3),
            (3,4),(3,5),(4,5),(5,6),
            (0,7),(1,7),(0,8),(7,8)) t(x,y)
        ),
        alive0 AS MATERIALIZED (
          SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
          FROM e0 WHERE src <> dst
        )
        """
    parts = [head]
    for i in range(1, iterations + 1):
        parts.append(
            f""",
        sym{i} AS MATERIALIZED (
          SELECT a AS id, b AS other FROM alive{i - 1}
          UNION ALL
          SELECT b AS id, a AS other FROM alive{i - 1}
        ),
        tri{i} AS (
          SELECT x.id AS a, y.id AS b, count(*) AS s
          FROM sym{i} x
          JOIN sym{i} y ON x.other = y.other AND x.id < y.id
          JOIN alive{i - 1} e ON e.a = x.id AND e.b = y.id
          GROUP BY x.id, y.id
        ),
        supp{i} AS MATERIALIZED (
          SELECT e.a, e.b, coalesce(t.s, 0) AS s
          FROM alive{i - 1} e
          LEFT JOIN tri{i} t ON t.a = e.a AND t.b = e.b
        ),
        alive{i} AS MATERIALIZED (
          SELECT a, b FROM supp{i} WHERE s >= {k - 2}
        )
            """
        )
    parts.append(
        f"SELECT a, b, cast(s AS integer) AS support "
        f"FROM supp{iterations} WHERE s >= {k - 2}"
    )
    return "".join(parts)


def _betweenness_oracle_sql(levels: int) -> str:
    """Unrolled Brandes over the planted graph (see
    q_graph_betweenness): forward level frames ``l_k`` carry
    shortest-path counts σ (sum over level-(k-1) predecessors, with a
    settled anti-join), backward frames ``d_k`` carry the dependency
    δ(v) = Σ_w σ(v)/σ(w)·(1+δ(w)) over level-(k+1) successors. Levels
    past the true depth are empty, making a fixed unroll fixpoint-safe;
    σ are integer-exact doubles and the final score is rounded to 6
    (matching the operator's round-before-compare). Every frame is
    MATERIALIZED — each is referenced by several later frames and
    un-materialized CTE re-evaluation would blow up exponentially."""
    head = """
        WITH e AS MATERIALIZED (
          SELECT 'n' || cast(n_nationkey AS varchar) AS u,
                 'n' || cast(n_nationkey + 1 AS varchar) AS v
          FROM nation WHERE n_nationkey < 11
          UNION ALL
          SELECT 'n' || cast(n_nationkey AS varchar),
                 'p' || cast(n_nationkey AS varchar)
          FROM nation WHERE n_nationkey IN (2, 6)
          UNION ALL
          SELECT 'p' || cast(n_nationkey AS varchar),
                 'n' || cast(n_nationkey + 2 AS varchar)
          FROM nation WHERE n_nationkey IN (2, 6)
          UNION ALL
          SELECT 'n' || cast(n_nationkey AS varchar),
                 'r' || cast(n_nationkey % 3 AS varchar)
          FROM nation WHERE n_nationkey < 6
        ),
        srcs AS (SELECT 'n0' AS s UNION ALL SELECT 'n4'),
        l0 AS MATERIALIZED (
          SELECT s, s AS id, cast(1 AS double) AS sigma FROM srcs
        ),
        st0 AS MATERIALIZED (SELECT s, id FROM l0)
        """
    parts = [head]
    for k in range(1, levels + 1):
        parts.append(
            f""",
        l{k} AS MATERIALIZED (
          SELECT p.s, e.v AS id, sum(p.sigma) AS sigma
          FROM l{k - 1} p
          JOIN e ON p.id = e.u
          LEFT JOIN st{k - 1} st ON p.s = st.s AND e.v = st.id
          WHERE st.id IS NULL
          GROUP BY p.s, e.v
        ),
        st{k} AS MATERIALIZED (
          SELECT s, id FROM st{k - 1} UNION ALL SELECT s, id FROM l{k}
        )
            """
        )
    parts.append(
        f""",
        d{levels} AS MATERIALIZED (
          SELECT s, id, cast(0 AS double) AS delta FROM l{levels}
        )
        """
    )
    for k in range(levels - 1, 0, -1):
        parts.append(
            f""",
        d{k} AS MATERIALIZED (
          SELECT lv.s, lv.id, coalesce(c.delta, 0) AS delta
          FROM l{k} lv LEFT JOIN (
            SELECT a.s, a.id,
                   sum(a.sigma / w.sigma * (1 + w.delta)) AS delta
            FROM l{k} a
            JOIN e ON a.id = e.u
            JOIN (
              SELECT dn.s, dn.id, dn.delta, ln.sigma
              FROM d{k + 1} dn JOIN l{k + 1} ln
                ON dn.s = ln.s AND dn.id = ln.id
            ) w ON a.s = w.s AND e.v = w.id
            GROUP BY a.s, a.id
          ) c ON lv.s = c.s AND lv.id = c.id
        )
            """
        )
    union = " UNION ALL ".join(
        f"SELECT id, delta FROM d{k}" for k in range(1, levels + 1)
    )
    parts.append(
        f"""
        SELECT id, round(sum(delta), 6) AS betweenness
        FROM ({union}) WHERE delta > 0
        GROUP BY id HAVING round(sum(delta), 6) > 0
        """
    )
    return "".join(parts)


def _sssp_oracle_sql(iterations: int) -> str:
    """Unrolled Bellman–Ford over the planted weighted DAG (see
    q_graph_sssp_weighted): d_i(v) = min(d_{i-1}(v), min_u(d_{i-1}(u) +
    w(u,v))). The operator's frontier variant produces the identical
    frame after every round (relaxations from unimproved nodes were
    already applied when they last improved), and rounds past the
    fixpoint are no-ops, so any unroll depth ≥ the longest shortest
    path's edge count matches exactly; integer weights keep every
    double exact."""
    head = """
        WITH e0 AS (
          SELECT 'n' || cast(n_nationkey AS varchar) AS u,
                 'n' || cast(n_nationkey + 1 AS varchar) AS v,
                 cast((n_nationkey % 3) + 1 AS double) AS w
          FROM nation WHERE n_nationkey < 24
          UNION ALL
          SELECT 'n' || cast(n_nationkey AS varchar),
                 'n' || cast(n_nationkey + 5 AS varchar),
                 cast(3 AS double)
          FROM nation WHERE n_nationkey % 5 = 0 AND n_nationkey < 20
        ),
        e AS MATERIALIZED (SELECT u, v, min(w) AS w FROM e0 GROUP BY u, v),
        d0 AS (SELECT 'n0' AS id, cast(0 AS double) AS dist)
        """
    parts = [head]
    for i in range(1, iterations + 1):
        parts.append(
            f""",
        d{i} AS MATERIALIZED (
          SELECT id, min(dd) AS dist FROM (
            SELECT id, dist AS dd FROM d{i - 1}
            UNION ALL
            SELECT e.v AS id, p.dist + e.w AS dd
            FROM d{i - 1} p JOIN e ON p.id = e.u
          ) GROUP BY id
        )
            """
        )
    parts.append(f"SELECT id, dist FROM d{iterations}")
    return "".join(parts)


def _pagerank_oracle_sql(
    iterations: int,
    damping: float,
    weighted: bool = False,
    seeds: tuple[str, ...] | None = None,
) -> str:
    """Unrolled PageRank recurrence over the planted nation graph
    (see q_graph_pagerank). Generated per iteration so the SQL mirrors
    the operator's float arithmetic EXACTLY: contributions use
    rank * (1.0/out_deg) (not rank/out_deg — different IEEE rounding),
    the teleport term is (1.0 - d)/n, and the damped term is
    d * (c + dangling/n). ``weighted=True`` mirrors the weighted path:
    per-(src,dst) weight sums, w = ew / out-weight-sum (see
    q_graph_pagerank_weighted for the planted weights). ``seeds``
    mirrors the personalized path: a teleport CTE with 1/|S| on the
    seeds and 0 elsewhere replaces both the uniform teleport and the
    uniform dangling redistribution, and it0 starts at t (all planted
    seeds exist in the nation graph at every SF, so |S| is the literal
    seed count — the operator counts S∩nodes at runtime)."""
    d = repr(damping)
    if weighted:
        head = """
        WITH e0 AS (
          SELECT 'n' || cast(n_nationkey AS varchar) AS src,
                 'n' || cast((n_nationkey + 1) % 25 AS varchar) AS dst,
                 cast(1 + n_nationkey % 3 AS double) AS wt
          FROM nation
          UNION ALL
          SELECT 'n' || cast(n_nationkey AS varchar),
                 'r' || cast(n_regionkey AS varchar),
                 cast(2.0 AS double)
          FROM nation
        ),
        e AS (SELECT src, dst, sum(wt) AS ew FROM e0
              WHERE wt > 0 GROUP BY src, dst),
        nodes AS (SELECT src AS id FROM e UNION SELECT dst AS id FROM e),
        cnt AS (SELECT cast(count(*) AS double) AS n FROM nodes),
        outdeg AS (SELECT src, sum(ew) AS out_w FROM e GROUP BY src),
        w AS (
          SELECT e.src, e.dst, e.ew / outdeg.out_w AS w
          FROM e JOIN outdeg USING (src)
        ),
        it0 AS (SELECT id, (SELECT 1.0 / n FROM cnt) AS rank FROM nodes)
        """
    else:
        head = """
        WITH e0 AS (
          SELECT 'n' || cast(n_nationkey AS varchar) AS src,
                 'n' || cast((n_nationkey + 1) % 25 AS varchar) AS dst
          FROM nation
          UNION ALL
          SELECT 'n' || cast(n_nationkey AS varchar),
                 'r' || cast(n_regionkey AS varchar)
          FROM nation
        ),
        e AS (SELECT DISTINCT src, dst FROM e0),
        nodes AS (SELECT src AS id FROM e UNION SELECT dst AS id FROM e),
        cnt AS (SELECT cast(count(*) AS double) AS n FROM nodes),
        outdeg AS (SELECT src, count(*) AS out_deg FROM e GROUP BY src),
        w AS (
          -- cast: bare 1.0 is DECIMAL(2,1) in DuckDB, and decimal
          -- division would only coincidentally match Spark's IEEE
          -- double 1.0/out_deg when every reciprocal is exact
          SELECT e.src, e.dst, cast(1.0 AS double) / outdeg.out_deg AS w
          FROM e JOIN outdeg USING (src)
        ),
        it0 AS (SELECT id, (SELECT 1.0 / n FROM cnt) AS rank FROM nodes)
        """
    if seeds is not None:
        ids = ", ".join(f"'{s}'" for s in seeds)
        head = head.replace(
            "it0 AS (SELECT id, (SELECT 1.0 / n FROM cnt) AS rank FROM nodes)",
            f"""tele AS (
          SELECT id,
                 CASE WHEN id IN ({ids})
                      THEN cast(1.0 AS double) / {len(seeds)}
                      ELSE cast(0.0 AS double) END AS t
          FROM nodes
        ),
        it0 AS (SELECT id, t AS rank FROM tele)""",
        )
    parts = [head]
    for i in range(1, iterations + 1):
        if seeds is not None:
            update = f"""it{i} AS (
          SELECT nd.id,
                 (1.0 - {d}) * t.t
                   + {d} * (coalesce(c.c, 0.0) + dang{i}.dm * t.t) AS rank
          FROM nodes nd
          JOIN tele t ON t.id = nd.id
          CROSS JOIN dang{i}
          LEFT JOIN contrib{i} c ON c.id = nd.id
        )"""
        else:
            update = f"""it{i} AS (
          SELECT nd.id,
                 (1.0 - {d}) / cnt.n
                   + {d} * (coalesce(c.c, 0.0) + dang{i}.dm / cnt.n) AS rank
          FROM nodes nd
          CROSS JOIN cnt
          CROSS JOIN dang{i}
          LEFT JOIN contrib{i} c ON c.id = nd.id
        )"""
        parts.append(
            f""",
        dang{i} AS (
          SELECT coalesce(sum(r.rank), 0.0) AS dm
          FROM it{i - 1} r LEFT JOIN outdeg o ON r.id = o.src
          WHERE o.src IS NULL
        ),
        contrib{i} AS (
          SELECT w.dst AS id, sum(r.rank * w.w) AS c
          FROM w JOIN it{i - 1} r ON w.src = r.id
          GROUP BY w.dst
        ),
        {update}
            """
        )
    parts.append(
        f"SELECT id, round(rank, 9) AS rank FROM it{iterations}"
    )
    return "".join(parts)


def _pagerank_delta_oracle_sql(iterations: int, damping: float) -> str:
    """Unrolled TWO-window PageRank-delta recurrence over the planted
    nation snapshots (see q_graph_pagerank_delta): window a = bare
    25-cycle n→(n+1)%25, window b = shifted cycle n→(n+2)%25 plus
    nation→region edges. Each window's CTE chain is the exact
    arithmetic of _pagerank_oracle_sql (uniform teleport, dangling
    redistribution, rank*(1.0/out_deg) contributions), suffixed a/b;
    the final select full-outer-joins the two it{N} frames with
    absent-window rank coalesced to 0.0 — mirroring
    operators/pagerank.py::pagerank_delta — and rounds to 9."""
    d = repr(damping)
    heads = {
        "a": """
          SELECT 'n' || cast(n_nationkey AS varchar) AS src,
                 'n' || cast((n_nationkey + 1) % 25 AS varchar) AS dst
          FROM nation
        """,
        "b": """
          SELECT 'n' || cast(n_nationkey AS varchar) AS src,
                 'n' || cast((n_nationkey + 2) % 25 AS varchar) AS dst
          FROM nation
          UNION ALL
          SELECT 'n' || cast(n_nationkey AS varchar),
                 'r' || cast(n_regionkey AS varchar)
          FROM nation
        """,
    }
    parts = ["WITH "]
    for s, e0 in heads.items():
        parts.append(
            f"""e0{s} AS ({e0}),
        e{s} AS (SELECT DISTINCT src, dst FROM e0{s}),
        nodes{s} AS (SELECT src AS id FROM e{s} UNION SELECT dst AS id FROM e{s}),
        cnt{s} AS (SELECT cast(count(*) AS double) AS n FROM nodes{s}),
        outdeg{s} AS (SELECT src, count(*) AS out_deg FROM e{s} GROUP BY src),
        w{s} AS (
          SELECT e{s}.src, e{s}.dst, cast(1.0 AS double) / outdeg{s}.out_deg AS w
          FROM e{s} JOIN outdeg{s} USING (src)
        ),
        it0{s} AS (SELECT id, (SELECT 1.0 / n FROM cnt{s}) AS rank FROM nodes{s}),
        """
        )
        for i in range(1, iterations + 1):
            parts.append(
                f"""dang{i}{s} AS (
          SELECT coalesce(sum(r.rank), 0.0) AS dm
          FROM it{i - 1}{s} r LEFT JOIN outdeg{s} o ON r.id = o.src
          WHERE o.src IS NULL
        ),
        contrib{i}{s} AS (
          SELECT w{s}.dst AS id, sum(r.rank * w{s}.w) AS c
          FROM w{s} JOIN it{i - 1}{s} r ON w{s}.src = r.id
          GROUP BY w{s}.dst
        ),
        it{i}{s} AS (
          SELECT nd.id,
                 (1.0 - {d}) / cnt{s}.n
                   + {d} * (coalesce(c.c, 0.0) + dang{i}{s}.dm / cnt{s}.n) AS rank
          FROM nodes{s} nd
          CROSS JOIN cnt{s}
          CROSS JOIN dang{i}{s}
          LEFT JOIN contrib{i}{s} c ON c.id = nd.id
        ),
        """
            )
    # Drop the trailing comma of the last CTE block.
    parts[-1] = parts[-1].rstrip().rstrip(",")
    parts.append(
        f"""
        SELECT coalesce(a.id, b.id) AS id,
               round(coalesce(a.rank, 0.0), 9) AS rank_before,
               round(coalesce(b.rank, 0.0), 9) AS rank_after,
               round(coalesce(b.rank, 0.0) - coalesce(a.rank, 0.0), 9) AS delta
        FROM it{iterations}a a FULL OUTER JOIN it{iterations}b b ON a.id = b.id
        """
    )
    return "".join(parts)


def _hll_rank_case_sql(w_bits: int = 58, scale: int = 59) -> str:
    """Generated integer-comparison CASE for the HLL leading-1 rank of
    a column ``w`` — the ONE cross-engine-exact leading-zero count
    (mirrors operators/sketches.py::_hll_rank; shared by every
    HLL-family oracle so the chain cannot drift per-entry)."""
    return f"CASE WHEN w = 0 THEN {scale} " + " ".join(
        f"WHEN w >= {1 << (w_bits - r)} THEN {r}" for r in range(1, w_bits + 1)
    ) + " END"


def _hll_numer(m: int, scale: int = 59) -> float:
    """alpha_m * m^2 * 2^scale — the raw-HLL estimator numerator
    (mirrors operators/sketches.py::hll_estimate; shared so a constant
    change lands in every HLL-family oracle at once)."""
    alpha = 0.7213 / (1.0 + 1.079 / m)
    return alpha * m * m * float(1 << scale)


def _hll_oracle_sql() -> str:
    """HLL oracle: same md5 routing, the shared generated rank CASE,
    and the scaled-integer harmonic sum in HUGEINT — mirrors
    operators/sketches.py::hll_build/hll_estimate exactly."""
    scale, m = 59, 64
    rank_case = _hll_rank_case_sql()
    numer = _hll_numer(m)
    zero_term = (
        f"CAST({m} - present AS HUGEINT) * CAST({1 << scale} AS HUGEINT)"
    )
    s_expr = f"coalesce(s_present, 0) + {zero_term}"
    return f"""
        WITH h AS (
          SELECT md5_number_upper('hll:' || cast(user_id AS varchar)) AS hu
          FROM events WHERE user_id IS NOT NULL
        ),
        rw AS (SELECT hu % {m} AS register, hu // {m} AS w FROM h),
        regs AS (
          SELECT register, max({rank_case}) AS m_rank FROM rw GROUP BY register
        ),
        agg AS (
          SELECT count(*) AS present,
                 sum(CAST(1 AS BIGINT) << ({scale} - m_rank)) AS s_present
          FROM regs
        )
        SELECT {m} AS m,
               CAST({m} - present AS BIGINT) AS n_zero,
               CAST({s_expr} AS VARCHAR) AS s_scaled,
               round({numer!r} / CAST({s_expr} AS DOUBLE), 3) AS est_distinct
        FROM agg
    """


def _hll_overlap_oracle_sql() -> str:
    """Pairwise HLL overlap oracle: per-type sketches with the shared
    md5 routing + rank CASE, densified over all 64 registers (empty =
    rank 0), register equi-join per unordered pair, HUGEINT harmonic
    sums, and the same fixed-order inclusion-exclusion float — mirrors
    operators/sketches.py::hll_overlap exactly."""
    scale, m = 59, 64
    rank_case = _hll_rank_case_sql()
    numer = _hll_numer(m)
    return f"""
        WITH h AS (
          SELECT event_type AS grp,
                 md5_number_upper('hll:' || cast(user_id AS varchar)) AS hu
          FROM events WHERE user_id IS NOT NULL
        ),
        rw AS (SELECT grp, hu % {m} AS register, hu // {m} AS w FROM h),
        regs AS (
          SELECT grp, register, max({rank_case}) AS m_rank
          FROM rw GROUP BY grp, register
        ),
        grps AS (SELECT DISTINCT grp FROM regs),
        dense AS (
          SELECT g.grp, r.register, coalesce(s.m_rank, 0) AS m_rank
          FROM grps g
          CROSS JOIN (SELECT unnest(range(0, {m})) AS register) r
          LEFT JOIN regs s
            ON s.grp = g.grp AND s.register = r.register
        ),
        pairs AS (
          SELECT d1.grp AS a, d2.grp AS b,
                 sum(CAST(1 AS BIGINT) << ({scale} - d1.m_rank)) AS sa,
                 sum(CAST(1 AS BIGINT) << ({scale} - d2.m_rank)) AS sb,
                 sum(CAST(1 AS BIGINT)
                     << ({scale} - greatest(d1.m_rank, d2.m_rank))) AS su
          FROM dense d1
          JOIN dense d2 ON d1.register = d2.register AND d1.grp < d2.grp
          GROUP BY 1, 2
        )
        SELECT a, b,
               CAST(sa AS VARCHAR) AS s_a,
               CAST(sb AS VARCHAR) AS s_b,
               CAST(su AS VARCHAR) AS s_union,
               round({numer!r} / CAST(sa AS DOUBLE), 3) AS est_a,
               round({numer!r} / CAST(sb AS DOUBLE), 3) AS est_b,
               round({numer!r} / CAST(su AS DOUBLE), 3) AS est_union,
               round({numer!r} / CAST(sa AS DOUBLE)
                     + {numer!r} / CAST(sb AS DOUBLE)
                     - {numer!r} / CAST(su AS DOUBLE), 3) AS est_overlap
        FROM pairs
    """


def _anf_oracle_sql(hops: int = 2, m: int = 16) -> str:
    """HyperANF oracle: the same md5 register routing and generated
    58-branch leading-1 rank CASE as `_hll_oracle_sql`, then ``hops``
    unrolled rounds of registerwise-max merge over the symmetrized
    planted nation graph (row-based: a register has a row iff it has
    ever been touched — rank 0 never occurs, mirroring the operator's
    packed-array 0 = empty convention), finished with the per-node
    scaled-integer harmonic sum in HUGEINT."""
    scale = 59
    rank_case = _hll_rank_case_sql()
    numer = _hll_numer(m)
    rounds = []
    for i in range(1, hops + 1):
        prev = f"sk{i - 1}"
        rounds.append(f""",
        sk{i} AS (
          SELECT id, register, max(m_rank) AS m_rank FROM (
            SELECT id, register, m_rank FROM {prev}
            UNION ALL
            SELECT e.u AS id, s.register, s.m_rank
            FROM sym e JOIN {prev} s ON s.id = e.v
          ) GROUP BY id, register
        )""")
    s_expr = (
        f"coalesce(s_present, 0) + CAST({m} - present AS HUGEINT)"
        f" * CAST({1 << scale} AS HUGEINT)"
    )
    return f"""
        WITH nedge AS (
          SELECT 'n' || cast(n_nationkey AS varchar) AS u,
                 'n' || cast((n_nationkey + 1) % 25 AS varchar) AS v
          FROM nation
          UNION ALL
          SELECT 'n' || cast(n_nationkey AS varchar),
                 'r' || cast(n_regionkey AS varchar)
          FROM nation
        ),
        sym AS (
          SELECT DISTINCT u, v FROM (
            SELECT u, v FROM nedge UNION ALL SELECT v AS u, u AS v FROM nedge
          ) WHERE u <> v
        ),
        nodes AS (
          SELECT DISTINCT u AS id FROM (
            SELECT u FROM nedge UNION ALL SELECT v AS u FROM nedge
          )
        ),
        h AS (
          SELECT id, md5_number_upper('anf:' || id) AS hu FROM nodes
        ),
        sk0 AS (
          SELECT id, register, {rank_case} AS m_rank FROM (
            SELECT id, cast(hu % {m} AS int) AS register, hu // {m} AS w
            FROM h
          )
        ){''.join(rounds)},
        agg AS (
          SELECT id, count(*) AS present,
                 sum(CAST(1 AS BIGINT) << ({scale} - m_rank)) AS s_present
          FROM sk{hops} GROUP BY id
        )
        SELECT id,
               cast({m} - present AS bigint) AS n_zero,
               cast({s_expr} AS varchar) AS s_scaled,
               round({numer!r} / cast({s_expr} AS double), 3) AS est_ball
        FROM agg
    """


def _kmeans_assign_ctes(
    k: int = 4, iterations: int = 2, scale: int = 1024, src: str = "embeddings",
    suffix: str = "",
) -> str:
    """CTE chain (no leading WITH) ending at ``assign{iterations}``:
    unrolled Lloyd rounds mirroring operators/clustering.py::
    kmeans_assign — every step integer arithmetic (quantized points,
    integer distance sums, floored centroid means), so assignment is
    bit-identical; emptied clusters carry the previous centroid.
    ``src`` must expose (vec_id, embedding). ``suffix`` namespaces every
    CTE so several chains can coexist in one query (the PQ oracle runs
    one chain per subspace)."""
    sx = suffix
    parts = [f"""
        pts{sx} AS (
          SELECT vec_id AS id, d,
                 CAST(floor(CAST(embedding[d] AS DOUBLE) * {scale} + 0.5)
                   AS BIGINT) AS q
          FROM {src}, UNNEST(generate_series(1, len(embedding))) AS t(d)
          WHERE embedding IS NOT NULL
        ),
        seeds{sx} AS (
          SELECT id, row_number() OVER (ORDER BY id) - 1 AS cluster
          FROM (SELECT DISTINCT id FROM pts{sx} ORDER BY id LIMIT {k})
        ),
        cent0{sx} AS (
          SELECT cluster, d, q AS cq FROM seeds{sx} JOIN pts{sx} USING (id)
        )"""]
    for i in range(1, iterations + 1):
        prev = f"cent{i - 1}{sx}"
        parts.append(f""",
        dist{i}{sx} AS (
          SELECT id, cluster, sum((q - cq) * (q - cq)) AS dist
          FROM pts{sx} JOIN {prev} USING (d)
          GROUP BY id, cluster
        ),
        assign{i}{sx} AS (
          SELECT id, cluster FROM (
            SELECT id, cluster,
                   row_number() OVER (PARTITION BY id
                                      ORDER BY dist ASC, cluster ASC) AS rn
            FROM dist{i}{sx}
          ) WHERE rn = 1
        ),
        newc{i}{sx} AS (
          SELECT cluster, d,
                 CAST(floor(CAST(sum(q) AS DOUBLE) / CAST(count(*) AS DOUBLE))
                   AS BIGINT) AS cq
          FROM assign{i}{sx} JOIN pts{sx} USING (id)
          GROUP BY cluster, d
        ),
        cent{i}{sx} AS (
          SELECT * FROM newc{i}{sx}
          UNION ALL
          SELECT p.* FROM {prev} p
          WHERE p.cluster NOT IN (SELECT DISTINCT cluster FROM newc{i}{sx})
        )""")
    return "".join(parts)


def _morton_sql(exprs: list, bits: int = 16) -> str:
    """Unrolled Morton interleave of SQL integer expressions — the
    operators/layout.py::morton_key bit arithmetic verbatim (clamp to
    [0, 2^bits), bit i of column j → output bit i·n+j)."""
    n = len(exprs)
    terms = []
    for j, ex in enumerate(exprs):
        v = f"least(greatest(cast({ex} AS bigint), 0), {(1 << bits) - 1})"
        for i in range(bits):
            terms.append(f"((({v} >> {i}) & 1) << {i * n + j})")
    return " | ".join(terms)


def _pq_oracle_sql(
    m: int = 4,
    k_sub: int = 4,
    iterations: int = 2,
    scale: int = 1024,
    k: int = 10,
    rf: int = 4,
    dim: int = 64,
) -> str:
    """Mirror of operators/similarity.py::pq_topk: one kmeans CTE chain
    per subspace (suffix-namespaced), integer ADC lookup table from the
    identically-quantized query (vec_id 0), per-vector code-sum
    distance, (adist ASC, id) candidate cut, exact-cosine rerank — the
    sq_topk oracle tail."""
    dsub = dim // m
    subs = []
    chains = []
    luts = []
    codes = []
    for s in range(m):
        lo, hi = s * dsub + 1, (s + 1) * dsub
        subs.append(f"""
        sub{s} AS (
          SELECT vec_id, embedding[{lo}:{hi}] AS embedding FROM nzsrc
        )""")
        chains.append(
            _kmeans_assign_ctes(
                k_sub, iterations, scale, src=f"sub{s}", suffix=f"_s{s}"
            )
        )
        # centroid d is subspace-local 1-based; global = s·dsub + d
        luts.append(f"""
            SELECT {s} AS sub, c.cluster,
                   sum((q.qd - c.cq) * (q.qd - c.cq)) AS ad
            FROM cent{iterations - 1}_s{s} c
            JOIN q ON q.d = c.d + {s * dsub}
            GROUP BY c.cluster""")
        codes.append(
            f"SELECT {s} AS sub, id, cluster FROM assign{iterations}_s{s}"
        )
    return f"""
        WITH p AS (
          SELECT vec_id, cast(embedding AS double[]) AS v FROM embeddings
        ),
        nz AS (
          SELECT vec_id, v FROM p
          WHERE sqrt(list_sum(list_transform(v, x -> x * x))) > 0
        ),
        nzsrc AS (SELECT vec_id, v AS embedding FROM nz),
        {",".join(subs)},
        {",".join(chains)},
        q AS (
          SELECT d,
                 CAST(floor(CAST(embedding[d] AS DOUBLE) * {scale} + 0.5)
                   AS BIGINT) AS qd
          FROM embeddings, UNNEST(generate_series(1, len(embedding))) t(d)
          WHERE vec_id = 0
        ),
        lut AS ({" UNION ALL ".join(luts)}),
        codes AS ({" UNION ALL ".join(codes)}),
        adist AS (
          SELECT codes.id AS vec_id, sum(lut.ad) AS adist
          FROM codes JOIN lut
            ON codes.sub = lut.sub AND codes.cluster = lut.cluster
          GROUP BY codes.id
        ),
        cand AS (
          SELECT a.vec_id, nz.v
          FROM adist a JOIN nz ON a.vec_id = nz.vec_id
          ORDER BY a.adist ASC, a.vec_id ASC LIMIT {k * rf}
        )
        SELECT vec_id,
               round(list_cosine_similarity(
                 v, (SELECT cast(embedding AS double[]) FROM embeddings
                     WHERE vec_id = 0)), 3) AS cosine
        FROM cand
        ORDER BY cosine DESC, vec_id
        LIMIT {k}
    """


def _kmeans_oracle_sql(k: int = 4, iterations: int = 2, scale: int = 1024) -> str:
    return f"""
        WITH {_kmeans_assign_ctes(k, iterations, scale)}
        SELECT id AS vec_id, CAST(cluster AS BIGINT) AS cluster
        FROM assign{iterations}
    """


_SEMDEDUP_AUG_SQL = """
          SELECT vec_id, embedding FROM embeddings
          UNION ALL
          SELECT vec_id + 100000 AS vec_id, embedding
          FROM embeddings WHERE vec_id % 7 = 0
"""


def _semantic_dedup_oracle_sql(
    k: int = 4, iterations: int = 2, scale: int = 1024, threshold: float = 0.95
) -> str:
    """Mirror of operators/clustering.py::semantic_dedup over the
    duplicate-augmented embeddings table: the unrolled integer-exact
    k-means assignment (same CTE chain as the kmeans oracle) followed
    by the per-pair greedy min-id blocking predicate — a row is
    dropped iff a smaller-id cluster-mate has rounded cosine >=
    threshold; zero-norm rows are never paired."""
    return f"""
        WITH aug AS ({_SEMDEDUP_AUG_SQL}),
        {_kmeans_assign_ctes(k, iterations, scale, src="aug")},
        vecs AS (
          SELECT a.id, a.cluster, cast(e.embedding AS double[]) AS v,
                 list_dot_product(cast(e.embedding AS double[]),
                                  cast(e.embedding AS double[])) > 0
                   AS scorable
          FROM assign{iterations} a JOIN aug e ON a.id = e.vec_id
        ),
        blocked AS (
          SELECT DISTINCT y.id AS b
          FROM vecs x JOIN vecs y
            ON x.cluster = y.cluster AND x.id < y.id
          WHERE x.scorable AND y.scorable
            AND round(list_cosine_similarity(x.v, y.v), 3) >= {threshold}
        )
        SELECT v.id AS vec_id, CAST(v.cluster AS BIGINT) AS cluster,
               (b.b IS NULL) AS kept
        FROM vecs v LEFT JOIN blocked b ON v.id = b.b
    """


def _schema_audit_oracle_sql() -> str:
    """Conformance-audit oracle: the signature VALUES are generated
    from the SAME rule expansion the operator broadcasts
    (operators/triples.relation_signatures) — one definition, two
    engines, the repo's shared-rule-data convention."""
    from threat_intelligence_knowledge_graph_spark.operators.triples import (
        relation_signatures,
    )

    sigs = relation_signatures()
    values = ", ".join(f"('{p}', '{s}', '{o}')" for p, s, o in sigs)
    preds = ", ".join(f"'{p}'" for p in sorted({p for p, _s, _o in sigs}))
    return f"""
        WITH base AS (
          SELECT 'Domain_Evil-' || cast(o_orderkey AS varchar)
                   || '_Example_Net' AS dom,
                 'Ipv4_10_' || cast(o_orderkey % 250 AS varchar) || '_'
                   || cast((o_orderkey * 7) % 250 AS varchar) || '_'
                   || cast((o_orderkey % 249) + 1 AS varchar) AS ip,
                 o_orderkey AS k
          FROM orders
        ),
        nodes AS (
          SELECT 'Domain' AS node_label, dom AS node_id FROM base
          UNION
          SELECT 'Ipv4', ip FROM base
        ),
        triples AS (
          SELECT dom AS subj, 'RESOLVES_TO' AS pred, ip AS obj FROM base
          UNION ALL
          SELECT ip, 'RESOLVES_TO', dom FROM base WHERE k % 10 = 0
          UNION ALL
          SELECT dom, 'FOOBAR', ip FROM base WHERE k % 17 = 0
          UNION ALL
          SELECT dom, 'RESOLVES_TO', 'Missing_' || cast(k AS varchar)
          FROM base WHERE k % 23 = 0
        ),
        sigs(pred, subj_label, obj_label) AS (VALUES {values}),
        lab AS (
          SELECT t.subj, t.pred, t.obj,
                 ns.node_label AS subj_label, nd.node_label AS obj_label
          FROM triples t
          LEFT JOIN nodes ns ON t.subj = ns.node_id
          LEFT JOIN nodes nd ON t.obj = nd.node_id
        )
        SELECT l.subj, l.pred, l.obj, l.subj_label, l.obj_label,
               CASE
                 WHEN l.subj_label IS NULL OR l.obj_label IS NULL
                   THEN 'unknown_endpoint'
                 WHEN l.pred NOT IN ({preds}) THEN 'unknown_predicate'
                 WHEN s.pred IS NOT NULL THEN 'ok'
                 ELSE 'signature_mismatch'
               END AS status
        FROM lab l
        LEFT JOIN sigs s
          ON l.pred = s.pred AND l.subj_label = s.subj_label
         AND l.obj_label = s.obj_label
    """


def _textrank_oracle_sql(
    iterations: int = 3, damping: float = 0.85, k: int = 20
) -> str:
    """Unrolled weighted-PageRank recurrence over the word
    co-occurrence graph of every 5th document (see q_text_textrank).
    Same per-iteration arithmetic as _pagerank_oracle_sql's weighted
    path (contributions rank·w, teleport (1.0-d)/n, dangling kept
    generic though it is exactly 0 here — every node of an undirected
    graph has out-edges); the head builds edges from adjacent-token
    pairs via generate_series over the token array, the tail rounds to
    9 BEFORE the (rank DESC, term ASC) top-k cut."""
    d = repr(damping)
    parts = [
        """
        WITH tok0 AS (
          SELECT regexp_extract_all(lower(text), '[a-z0-9]{2,}') AS ts
          FROM documents WHERE doc_id % 5 = 0
        ),
        pr0 AS (
          SELECT least(ts[i], ts[i + 1]) AS a,
                 greatest(ts[i], ts[i + 1]) AS b
          FROM tok0, UNNEST(generate_series(1, len(ts) - 1)) AS u(i)
          WHERE ts[i] <> ts[i + 1]
        ),
        p AS (SELECT a, b, count(*) AS wt FROM pr0 GROUP BY a, b),
        e AS (
          SELECT a AS src, b AS dst, cast(wt AS double) AS ew FROM p
          UNION ALL
          SELECT b, a, cast(wt AS double) FROM p
        ),
        nodes AS (SELECT src AS id FROM e UNION SELECT dst AS id FROM e),
        cnt AS (SELECT cast(count(*) AS double) AS n FROM nodes),
        outdeg AS (SELECT src, sum(ew) AS out_w FROM e GROUP BY src),
        w AS (
          SELECT e.src, e.dst, e.ew / outdeg.out_w AS w
          FROM e JOIN outdeg USING (src)
        ),
        it0 AS (SELECT id, (SELECT 1.0 / n FROM cnt) AS rank FROM nodes)
        """
    ]
    for i in range(1, iterations + 1):
        parts.append(
            f""",
        dang{i} AS (
          SELECT coalesce(sum(r.rank), 0.0) AS dm
          FROM it{i - 1} r LEFT JOIN outdeg o ON r.id = o.src
          WHERE o.src IS NULL
        ),
        contrib{i} AS (
          SELECT w.dst AS id, sum(r.rank * w.w) AS c
          FROM w JOIN it{i - 1} r ON w.src = r.id
          GROUP BY w.dst
        ),
        it{i} AS (
          SELECT nd.id,
                 (1.0 - {d}) / cnt.n
                   + {d} * (coalesce(c.c, 0.0) + dang{i}.dm / cnt.n) AS rank
          FROM nodes nd
          CROSS JOIN cnt
          CROSS JOIN dang{i}
          LEFT JOIN contrib{i} c ON c.id = nd.id
        )
            """
        )
    parts.append(
        f"""
        SELECT term, rank, cast(rk AS int) AS rk FROM (
          SELECT id AS term, round(rank, 9) AS rank,
                 row_number() OVER (
                   ORDER BY round(rank, 9) DESC, id ASC
                 ) AS rk
          FROM it{iterations}
        ) WHERE rk <= {k}
        """
    )
    return "".join(parts)


def _profile_drift_oracle_sql() -> str:
    """Per-column profile UNION generated from the same _DRIFT_COLUMNS
    tuple the Spark entry profiles (single source of truth); identical
    round-6 ratio arithmetic (see q_events_profile_drift)."""

    def _prof(side: str, pred: str) -> str:
        parts = []
        for c in _DRIFT_COLUMNS:
            parts.append(
                f"SELECT '{c}' AS col, count(*) AS n, "
                f"sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS nu, "
                f"count(DISTINCT {c}) AS nd "
                f"FROM events WHERE {pred}"
            )
        return f"{side} AS ({' UNION ALL '.join(parts)})"

    return f"""
        WITH {_prof('pa', 'event_id % 2 = 0')},
        {_prof('pb', 'event_id % 2 = 1')}
        SELECT pa.col,
               cast(pa.n AS bigint) AS n_a,
               cast(pb.n AS bigint) AS n_b,
               round(cast(pa.nu AS double) / cast(pa.n AS double), 6)
                 AS null_rate_a,
               round(cast(pb.nu AS double) / cast(pb.n AS double), 6)
                 AS null_rate_b,
               round(cast(pb.nu AS double) / cast(pb.n AS double)
                     - cast(pa.nu AS double) / cast(pa.n AS double), 6)
                 AS null_rate_delta,
               cast(pa.nd AS bigint) AS n_distinct_a,
               cast(pb.nd AS bigint) AS n_distinct_b,
               CASE WHEN pa.nd > 0 THEN
                 round(cast(pb.nd AS double) / cast(pa.nd AS double), 6)
               END AS distinct_ratio
        FROM pa JOIN pb USING (col)
    """


def _refusal_oracle_sql() -> str:
    """Refusal-rate oracle: planted suffix + OR-of-lowercase-contains
    generated from the operator's own REFUSAL_PATTERNS (single source
    of truth; apostrophes SQL-escaped), one keyed aggregate."""
    from threat_intelligence_knowledge_graph_spark.operators.transcript_stats import (
        REFUSAL_PATTERNS,
    )

    cond = " OR ".join(
        "contains(lower(text), '{}')".format(p.replace("'", "''"))
        for p in REFUSAL_PATTERNS
    )
    return f"""
        WITH base AS ({_SYNTH_TRANSCRIPTS_SQL}),
        planted AS (
          SELECT conv_id, role,
                 CASE WHEN role = 'assistant'
                       AND (cast(conv_id AS bigint) + turn_idx) % 5 = 0
                      THEN text || ' I cannot help with that request.'
                      ELSE text END AS text
          FROM base
        ),
        a AS (
          SELECT conv_id,
                 CASE WHEN {cond} THEN 1 ELSE 0 END AS r
          FROM planted WHERE role = 'assistant' AND text IS NOT NULL
        )
        SELECT conv_id,
               cast(count(*) AS bigint) AS n_assistant,
               cast(sum(r) AS bigint) AS n_refusals,
               round(cast(sum(r) AS double) / cast(count(*) AS double), 6)
                 AS refusal_rate
        FROM a GROUP BY conv_id
    """


def oracle_sql() -> dict[str, str]:
    en = ", ".join(f"'{w}'" for w in STOPWORDS_EN)
    es = ", ".join(f"'{w}'" for w in LANG_STOPWORDS["es"])
    de = ", ".join(f"'{w}'" for w in LANG_STOPWORDS["de"])

    # Per-query BM25 CTE blocks for search_rank_eval (the search_ndcg
    # ranking chain, parametrized over the two pinned term sets; rel =
    # doc contains >= 2 distinct query terms).
    def _bm25_blocks(qid: str, terms: list[str]) -> str:
        tl = ", ".join(f"'{t}'" for t in terms)
        conds = " + ".join(
            f"CASE WHEN list_contains(toks, '{t}') THEN 1 ELSE 0 END"
            for t in terms
        )
        return f"""
            tf_{qid} AS (
              SELECT doc_id, dl, term, cast(count(*) AS bigint) AS tf
              FROM (
                SELECT doc_id, dl,
                       unnest(list_filter(toks,
                         t -> list_contains([{tl}], t))) AS term
                FROM b2
              ) GROUP BY 1, 2, 3
            ),
            dfr_{qid} AS (SELECT term, cast(count(*) AS bigint) AS df
                          FROM tf_{qid} GROUP BY term),
            scored_{qid} AS (
              SELECT doc_id, round(sum(
                       ln(1.0 + (n - df + 0.5) / (df + 0.5)) * (tf * 2.2)
                       / (tf + 1.2 * (0.25 + 0.75 * (dl * n) / tdl))), 6)
                       AS score
              FROM tf_{qid} JOIN dfr_{qid} USING (term) CROSS JOIN consts
              GROUP BY doc_id
            ),
            ranked_{qid} AS (
              SELECT doc_id, rk FROM (
                SELECT doc_id, row_number() OVER (
                  ORDER BY score DESC, doc_id ASC
                ) AS rk FROM scored_{qid}
              ) WHERE rk <= 10
            ),
            rel_{qid} AS (
              SELECT doc_id FROM b2 WHERE ({conds}) >= 2
            )"""

    _rank_eval_sql = (
        """
            WITH b2 AS (
              SELECT doc_id,
                     cast(len(regexp_extract_all(lower(text), '[a-z0-9]{2,}'))
                       AS bigint) AS dl,
                     regexp_extract_all(lower(text), '[a-z0-9]{2,}') AS toks
              FROM documents
            ),
            consts AS (
              SELECT cast(count(*) AS bigint) AS n,
                     cast(sum(dl) AS bigint) AS tdl
              FROM b2
            ),"""
        + ",".join(
            _bm25_blocks(qid, terms)
            for qid, terms in _RANK_EVAL_QUERIES.items()
        )
        + """,
            rankings AS (
              SELECT 'q_msv' AS query_id, doc_id, rk FROM ranked_q_msv
              UNION ALL
              SELECT 'q_ms', doc_id, rk FROM ranked_q_ms
            ),
            qrels AS (
              SELECT 'q_msv' AS query_id, doc_id FROM rel_q_msv
              UNION ALL
              SELECT 'q_ms', doc_id FROM rel_q_ms
            ),
            nrel AS (SELECT query_id, cast(count(*) AS bigint) AS n_rel
                     FROM qrels GROUP BY 1),
            j AS (
              SELECT r.query_id, r.rk AS pos,
                     CASE WHEN q.doc_id IS NOT NULL THEN 1 END AS is_rel
              FROM rankings r
              LEFT JOIN qrels q
                ON r.query_id = q.query_id AND r.doc_id = q.doc_id
            ),
            h AS (
              SELECT *, sum(coalesce(is_rel, 0)) OVER (
                PARTITION BY query_id ORDER BY pos
              ) AS hits
              FROM j
            ),
            per_q AS (
              SELECT query_id,
                     cast(count(*) AS bigint) AS n_ranked,
                     cast(min(CASE WHEN is_rel IS NOT NULL THEN pos END)
                       AS bigint) AS first_rel_rank,
                     cast(sum(CASE WHEN is_rel IS NOT NULL
                                   THEN hits * (2520 // pos)
                                   ELSE 0 END) AS bigint) AS ap_num
              FROM h GROUP BY 1
            )
            SELECT p.query_id, p.n_ranked,
                   coalesce(n.n_rel, 0) AS n_rel,
                   p.first_rel_rank,
                   CASE WHEN p.first_rel_rank IS NOT NULL
                        THEN round(1.0 / p.first_rel_rank, 6)
                        WHEN coalesce(n.n_rel, 0) > 0 THEN 0.0
                   END AS rr,
                   CASE WHEN coalesce(n.n_rel, 0) > 0
                        THEN round(cast(p.ap_num AS double)
                                   / cast(2520 * least(n.n_rel, 10)
                                          AS double), 6)
                   END AS ap
            FROM per_q p LEFT JOIN nrel n USING (query_id)
        """
    )
    return {
        "kg_chunks": """
            WITH d AS (
              SELECT cast(doc_id AS varchar) AS doc_id, text, length(text) AS n
              FROM documents WHERE length(text) > 0
            )
            SELECT doc_id,
                   cast(u.i AS int) AS chunk_index,
                   cast(floor((n - 1) / 90) + 1 AS int) AS total_chunks,
                   substring(text, cast(u.i AS int) * 90 + 1, 100) AS chunk_text
            FROM (
              SELECT doc_id, text, n,
                     unnest(range(0, cast(floor((n - 1) / 90) AS bigint) + 1)) AS i
              FROM d
            ) u
        """,
        "kg_node_ids": """
            SELECT doc_id,
                   CASE WHEN doc_id % 3 = 0 THEN 'Domain'
                        WHEN doc_id % 3 = 1 THEN 'IPv4'
                        ELSE 'URL' END AS node_type,
                   lower(CASE WHEN doc_id % 3 = 0 THEN 'Domain'
                              WHEN doc_id % 3 = 1 THEN 'IPv4'
                              ELSE 'URL' END)
                   || '_'
                   || regexp_replace(
                        'val-' || cast(doc_id AS varchar) || '/x.'
                        || cast(doc_id % 7 AS varchar),
                        '[^a-zA-Z0-9_-]', '_', 'g') AS node_id
            FROM documents
        """,
        "kg_ioc_typing": """
            WITH m AS (
              SELECT doc_id,
                     (['domains','md5s','cves','urls','ipv4s','not_a_class','asns'])
                       [cast(doc_id % 7 AS int) + 1] AS ioc_class
              FROM documents
            ), map(ioc_class, node_type) AS (VALUES
              ('domains','Domain'), ('md5s','Hash'), ('cves','Vulnerability'),
              ('urls','URL'), ('ipv4s','IPv4'), ('asns','ASN')
            )
            SELECT m.doc_id, m.ioc_class, map.node_type
            FROM m JOIN map USING (ioc_class)
        """,
        "kg_cve_mentions": f"""
            WITH t AS ({_CTI_TEXT_SQL})
            SELECT u.value AS value, count(*) AS n_mentions
            FROM t, unnest(regexp_extract_all(t.text, '{_CVE_RX}')) AS u(value)
            GROUP BY u.value
        """,
        "ioc_first_last_seen": f"""
            WITH t0 AS ({_CTI_TEXT_SQL}),
            t AS (
              SELECT t0.doc_id, t0.text, o.o_orderdate
              FROM t0 JOIN orders o
                ON t0.doc_id = cast(o.o_orderkey AS varchar)
            )
            SELECT u.value AS value,
                   min(t.o_orderdate) AS first_seen,
                   max(t.o_orderdate) AS last_seen,
                   count(DISTINCT t.doc_id) AS n_docs
            FROM t, unnest(regexp_extract_all(t.text, '{_CVE_RX}')) AS u(value)
            GROUP BY u.value
        """,
        "kg_ipv4_mentions": f"""
            WITH t AS ({_CTI_TEXT_SQL})
            SELECT DISTINCT t.doc_id AS doc_id, u.value AS value
            FROM t, unnest(regexp_extract_all(t.text, '{_IPV4_SIMPLE}')) AS u(value)
        """,
        # Analytic prediction of the kernel's output on constructed text:
        # sentence 1 → Domain RESOLVES_TO Ipv4 (lookup rule idx 8);
        # sentence 2 → Url CONTAINS Domain (lookup rule idx 9; the URL
        # string itself contains the domain, so co-location holds).
        # Stored ids are Python str.title() of
        # '<type>_<sanitized value>' (reference neo4j_store.py:114).
        "kg_triples_from_kernel": _KERNEL_TRIPLES_SQL,
        # The mock-backed LLM path must land on the same analytic triple
        # set (single-chunk docs; the mock emits the kernel's graph as
        # function-call JSON, with every 3rd payload truncated → repaired).
        "kg_llm_mock_triples": _KERNEL_TRIPLES_SQL,
        "kg_nodes_from_kernel": _KERNEL_NODES_SQL,
        # Gopher rules over the rule-planted corpus: identical signal
        # arithmetic (whitespace-split words, non-ws char totals,
        # replace-based symbol counts, line filters, distinct-stopword
        # membership) and the same precedence CASE (see q_gopher_rules
        # / operators/text_quality.py::gopher_rules).
        "gopher_rules": r"""
            WITH c AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 7 = 0 THEN 'tiny doc only'
                          WHEN doc_id % 11 = 0 THEN '#### ## ' || text
                          WHEN doc_id % 13 = 0 THEN repeat('111 ', 60)
                          WHEN doc_id % 17 = 0 THEN repeat('zap ', 60)
                          WHEN doc_id % 19 = 0 THEN repeat('a ', 60)
                          WHEN doc_id % 3 = 0
                            THEN '- a' || chr(10) || '- b' || chr(10)
                                 || '- c' || chr(10) || text
                          WHEN doc_id % 5 = 0 THEN text || '...'
                          ELSE text END AS text
              FROM documents
            ),
            sig AS (
              SELECT doc_id,
                     CASE WHEN length(trim(lower(coalesce(text, '')))) = 0
                          THEN 0
                          ELSE len(regexp_split_to_array(
                                 trim(lower(coalesce(text, ''))), '\s+'))
                     END AS n_words,
                     length(regexp_replace(lower(coalesce(text, '')),
                                           '\s+', '', 'g')) AS chars,
                     (length(lower(coalesce(text, '')))
                      - length(replace(lower(coalesce(text, '')), '#', '')))
                     + (length(lower(coalesce(text, '')))
                        - length(replace(lower(coalesce(text, '')),
                                         '...', ''))) / 3 AS symbols,
                     len(string_split(lower(coalesce(text, '')), chr(10)))
                       AS n_lines,
                     len(list_filter(
                           string_split(lower(coalesce(text, '')), chr(10)),
                           x -> starts_with(x, '- ')
                                OR starts_with(x, '* '))) AS n_bullets,
                     len(list_filter(
                           string_split(lower(coalesce(text, '')), chr(10)),
                           x -> ends_with(x, '...'))) AS n_ell,
                     len(list_filter(
                           regexp_split_to_array(
                             trim(lower(coalesce(text, ''))), '\s+'),
                           w -> regexp_matches(w, '[a-z]'))) AS n_alpha,
                     (CASE WHEN list_contains(regexp_split_to_array(
                        trim(lower(coalesce(text, ''))), '\s+'), 'the')
                        THEN 1 ELSE 0 END
                      + CASE WHEN list_contains(regexp_split_to_array(
                        trim(lower(coalesce(text, ''))), '\s+'), 'be')
                        THEN 1 ELSE 0 END
                      + CASE WHEN list_contains(regexp_split_to_array(
                        trim(lower(coalesce(text, ''))), '\s+'), 'to')
                        THEN 1 ELSE 0 END
                      + CASE WHEN list_contains(regexp_split_to_array(
                        trim(lower(coalesce(text, ''))), '\s+'), 'of')
                        THEN 1 ELSE 0 END
                      + CASE WHEN list_contains(regexp_split_to_array(
                        trim(lower(coalesce(text, ''))), '\s+'), 'and')
                        THEN 1 ELSE 0 END
                      + CASE WHEN list_contains(regexp_split_to_array(
                        trim(lower(coalesce(text, ''))), '\s+'), 'that')
                        THEN 1 ELSE 0 END
                      + CASE WHEN list_contains(regexp_split_to_array(
                        trim(lower(coalesce(text, ''))), '\s+'), 'have')
                        THEN 1 ELSE 0 END
                      + CASE WHEN list_contains(regexp_split_to_array(
                        trim(lower(coalesce(text, ''))), '\s+'), 'with')
                        THEN 1 ELSE 0 END) AS n_stop
              FROM c
            ),
            r AS (
              SELECT doc_id,
                     cast(n_words AS bigint) AS n_words,
                     CASE WHEN n_words > 0
                          THEN chars / n_words END AS mean_len,
                     CASE WHEN n_words > 0
                          THEN symbols / n_words END AS sym,
                     n_bullets / n_lines AS bullet,
                     n_ell / n_lines AS ell,
                     CASE WHEN n_words > 0
                          THEN n_alpha / n_words END AS alpha,
                     cast(n_stop AS bigint) AS n_stopwords
              FROM sig
            )
            SELECT doc_id, n_words,
                   round(mean_len, 6) AS mean_word_len,
                   round(sym, 6) AS symbol_ratio,
                   round(bullet, 6) AS bullet_frac,
                   round(ell, 6) AS ellipsis_frac,
                   round(alpha, 6) AS alpha_frac,
                   n_stopwords,
                   reason,
                   reason IS NULL AS passed
            FROM (
              SELECT *,
                     CASE WHEN n_words < 10 OR n_words > 100000
                          THEN 'word_count'
                          WHEN mean_len < 3.0 OR mean_len > 10.0
                          THEN 'mean_word_len'
                          WHEN sym > 0.1 THEN 'symbol_ratio'
                          WHEN bullet > 0.5 THEN 'bullet_lines'
                          WHEN ell > 0.3 THEN 'ellipsis_lines'
                          WHEN alpha < 0.8 THEN 'alpha_words'
                          WHEN n_stopwords < 1 THEN 'stopwords'
                     END AS reason
              FROM r
            )
        """,
        # STIX 2.1 exports: the analytic node/edge sets projected
        # through the SAME label→type CASE and md5-uuid formatting the
        # operator computes (see q_stix_objects / q_stix_relationships
        # and operators/stix_export.py).
        "stix_objects": f"""
            WITH n AS ({_KERNEL_NODES_SQL}),
            t AS (
              SELECT node_label, node_id,
                     CASE node_label
                          WHEN 'Domain' THEN 'domain-name'
                          WHEN 'Ipv4' THEN 'ipv4-addr'
                          WHEN 'Url' THEN 'url'
                          WHEN 'Vulnerability' THEN 'vulnerability'
                     END AS stix_type
              FROM n
            )
            SELECT stix_type || '--' || {_uuid_sql("node_id")} AS stix_id,
                   stix_type, node_label, node_id
            FROM t
        """,
        "stix_relationships": f"""
            WITH tr AS ({_KERNEL_TRIPLES_SQL}),
            e AS (
              SELECT subj AS src_id, pred AS rel_type, obj AS dst_id,
                     CASE pred WHEN 'RESOLVES_TO' THEN 'domain-name'
                               ELSE 'url' END AS src_type,
                     CASE pred WHEN 'RESOLVES_TO' THEN 'ipv4-addr'
                               ELSE 'domain-name' END AS dst_type
              FROM tr
            )
            SELECT 'relationship--'
                   || {_uuid_sql("src_id || chr(31) || rel_type || chr(31) || dst_id")}
                     AS stix_id,
                   lower(replace(rel_type, '_', '-')) AS relationship_type,
                   src_type || '--' || {_uuid_sql("src_id")} AS source_ref,
                   dst_type || '--' || {_uuid_sql("dst_id")} AS target_ref
            FROM e
        """,
        # Watchlist alerting over the CTI mention stream: the planted
        # century-grid watchlist joined to per-occurrence CVE mentions;
        # the summary LEFT-joins so silent watch values report (0, 0)
        # (see q_watchlist_alerts / q_watchlist_summary).
        "watchlist_alerts": f"""
            WITH docs AS ({_CTI_TEXT_SQL}),
            m AS (
              SELECT u.v AS value, doc_id AS conv_id
              FROM docs, UNNEST(regexp_extract_all(text, '{_CVE_RX}'))
                     AS u(v)
            ),
            wl AS (
              SELECT DISTINCT 'CVE-2021-'
                || cast((o_orderkey % 90) * 100 + 1000 AS varchar) AS value
              FROM orders
              UNION SELECT 'CVE-2017-0144'
            )
            SELECT DISTINCT m.value, m.conv_id FROM m JOIN wl USING (value)
        """,
        "watchlist_summary": f"""
            WITH docs AS ({_CTI_TEXT_SQL}),
            m AS (
              SELECT u.v AS value, doc_id AS conv_id
              FROM docs, UNNEST(regexp_extract_all(text, '{_CVE_RX}'))
                     AS u(v)
            ),
            wl AS (
              SELECT DISTINCT 'CVE-2021-'
                || cast((o_orderkey % 90) * 100 + 1000 AS varchar) AS value
              FROM orders
              UNION SELECT 'CVE-2017-0144'
            ),
            a AS (
              SELECT value, cast(count(*) AS bigint) AS n_mentions,
                     cast(count(DISTINCT conv_id) AS bigint) AS n_convs
              FROM m JOIN wl USING (value) GROUP BY value
            )
            SELECT w.value,
                   cast(coalesce(a.n_mentions, 0) AS bigint) AS n_mentions,
                   cast(coalesce(a.n_convs, 0) AS bigint) AS n_convs
            FROM wl w LEFT JOIN a USING (value)
        """,
        "kg_edge_dedup": """
            SELECT DISTINCT 'part_' || cast(l_partkey AS varchar) AS subj,
                   'SUPPLIED_BY' AS pred,
                   'supp_' || cast(l_suppkey AS varchar) AS obj
            FROM lineitem
        """,
        "kg_endpoint_semijoin": """
            WITH nodes AS (
              SELECT 'c_' || cast(c_custkey AS varchar) AS node_id FROM customer
            ), edges AS (
              SELECT DISTINCT 'c_' || cast(o_custkey AS varchar) AS src_id,
                     'c_' || cast(o_orderkey % 3000 AS varchar) AS dst_id
              FROM orders
            )
            SELECT e.src_id, e.dst_id FROM edges e
            WHERE EXISTS (SELECT 1 FROM nodes n WHERE n.node_id = e.src_id)
              AND EXISTS (SELECT 1 FROM nodes n WHERE n.node_id = e.dst_id)
        """,
        "kg_degrees": f"""
            WITH triples AS ({_CONSTRUCTED_TRIPLES_SQL}),
            outs AS (SELECT subj AS node_id, count(*) AS out_degree
                     FROM triples GROUP BY subj),
            ins  AS (SELECT obj AS node_id, count(*) AS in_degree
                     FROM triples GROUP BY obj)
            SELECT coalesce(outs.node_id, ins.node_id) AS node_id,
                   coalesce(out_degree, 0) AS out_degree,
                   coalesce(in_degree, 0) AS in_degree,
                   coalesce(out_degree, 0) + coalesce(in_degree, 0) AS degree
            FROM outs FULL OUTER JOIN ins ON outs.node_id = ins.node_id
        """,
        "kg_two_hop": f"""
            WITH triples AS ({_CONSTRUCTED_TRIPLES_SQL})
            SELECT t1.subj AS a, t1.pred AS pred1, t1.obj AS b,
                   t2.pred AS pred2, t2.obj AS c
            FROM triples t1 JOIN triples t2 ON t1.obj = t2.subj
            WHERE t1.pred = 'PLACED' AND t2.pred = 'HANDLED'
        """,
        "kg_metrics_rollup": """
            SELECT event_type AS stage, count(*) AS n_rows,
                   cast(floor(sum(value)) AS bigint) AS total_value
            FROM events GROUP BY event_type
        """,
        "tpch_q1": """
            SELECT l_returnflag, l_linestatus,
                   cast(sum(l_quantity) AS bigint) AS sum_qty,
                   cast(floor(sum(l_extendedprice)) AS bigint) AS sum_base_price,
                   cast(floor(sum(l_extendedprice * (1 - l_discount))) AS bigint) AS sum_disc_price,
                   round(avg(l_quantity), 4) AS avg_qty,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
        """,
        "join_customer_orders": """
            SELECT c_mktsegment, count(*) AS n_orders,
                   cast(floor(sum(o_totalprice)) AS bigint) AS revenue
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_mktsegment
        """,
        "events_user_windows": """
            SELECT event_id, user_id,
                   cast(row_number() OVER w AS int) AS rn,
                   lag(event_type) OVER w AS prev_type
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        """,
        "events_sessionize": """
            WITH flagged AS (
              SELECT user_id, event_id, ts,
                     CASE WHEN lag(ts) OVER w IS NULL
                          OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                          THEN 1 ELSE 0 END AS new_session
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ), sessions AS (
              SELECT user_id, event_id, ts,
                     sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
              FROM flagged
            )
            SELECT user_id, cast(session_id AS bigint) AS session_id,
                   count(*) AS n_events,
                   cast((epoch_us(max(ts)) - epoch_us(min(ts))) // 1000000 AS bigint) AS duration_sec
            FROM sessions GROUP BY user_id, session_id
        """,
        "events_type_cooccurrence": """
            WITH it AS (
              SELECT DISTINCT user_id, date_trunc('hour', ts) AS hr, event_type
              FROM events
            )
            SELECT x.event_type AS a, y.event_type AS b, count(*) AS weight
            FROM it x JOIN it y
              ON x.user_id = y.user_id AND x.hr = y.hr
             AND x.event_type < y.event_type
            GROUP BY 1, 2
        """,
        "top_parts_by_revenue": """
            WITH rev AS (
              SELECT l_partkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
              FROM lineitem GROUP BY l_partkey
            )
            SELECT p_partkey AS partkey, p_name AS part_name, revenue
            FROM rev JOIN part ON l_partkey = p_partkey
            ORDER BY revenue DESC, partkey
            LIMIT 10
        """,
        "set_ops_nations": """
            SELECT 'both' AS src, nationkey FROM (
              SELECT c_nationkey AS nationkey FROM customer
              INTERSECT
              SELECT s_nationkey FROM supplier
            )
            UNION ALL
            SELECT 'customer_only' AS src, nationkey FROM (
              SELECT DISTINCT c_nationkey AS nationkey FROM customer
              EXCEPT
              SELECT s_nationkey FROM supplier
            )
        """,
        "rollup_orders": """
            SELECT coalesce(o_orderpriority, 'ALL') AS priority,
                   coalesce(o_orderstatus, 'ALL') AS status,
                   count(*) AS n
            FROM orders
            GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
        """,
        # DuckDB sum(int) is HUGEINT (decimal128 in Arrow) while Spark's is
        # bigint; the driver hash is type-sensitive, so cast explicitly.
        "pivot_order_status": """
            SELECT o_orderpriority,
                   cast(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS bigint) AS n_f,
                   cast(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS bigint) AS n_o,
                   cast(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS bigint) AS n_p
            FROM orders GROUP BY o_orderpriority
        """,
        "anti_join_orders": """
            SELECT o_orderkey, o_orderstatus FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
        """,
        "events_hourly": """
            SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n
            FROM events GROUP BY 1, 2
        """,
        # Contrastive hard negatives: labeled pairs (every 97th id,
        # next id as positive), cross-scored corpus minus the pair
        # members, per-pair rounded-cosine rank (see q_hard_negatives).
        "hard_negatives": """
            WITH pr AS (
              SELECT e1.vec_id AS query_id, e2.vec_id AS pos_id,
                     e1.embedding AS qv
              FROM embeddings e1
              JOIN embeddings e2 ON e2.vec_id = e1.vec_id + 1
              WHERE e1.vec_id % 97 = 0
                AND sqrt(list_dot_product(cast(e1.embedding AS double[]),
                                          cast(e1.embedding AS double[]))) > 0
            ),
            sc AS (
              SELECT pr.query_id, pr.pos_id, e.vec_id AS neg_id,
                     round(list_cosine_similarity(
                       cast(e.embedding AS double[]),
                       cast(pr.qv AS double[])), 3) AS neg_cosine
              FROM embeddings e CROSS JOIN pr
              WHERE sqrt(list_dot_product(cast(e.embedding AS double[]),
                                          cast(e.embedding AS double[]))) > 0
                AND e.vec_id <> pr.query_id AND e.vec_id <> pr.pos_id
            )
            SELECT query_id, pos_id, neg_id, neg_cosine,
                   cast(rn AS int) AS neg_rank
            FROM (
              SELECT *, row_number() OVER (
                       PARTITION BY query_id, pos_id
                       ORDER BY neg_cosine DESC, neg_id ASC) AS rn
              FROM sc
            ) WHERE rn <= 3
        """,
        "similarity_batch_topk": """
            SELECT query_id, vec_id, cosine
            FROM (
              SELECT query_id, vec_id, cosine,
                     row_number() OVER (PARTITION BY query_id
                       ORDER BY cosine DESC, vec_id ASC) AS rn
              FROM (
                SELECT q.query_id, e.vec_id,
                       round(list_cosine_similarity(
                         cast(e.embedding AS double[]),
                         cast(q.qv AS double[])), 3) AS cosine
                FROM (SELECT * FROM embeddings
                      WHERE sqrt(list_dot_product(cast(embedding AS double[]),
                                                  cast(embedding AS double[]))) > 0) e
                CROSS JOIN (
                  SELECT vec_id AS query_id, embedding AS qv
                  FROM embeddings WHERE vec_id % 97 = 0
                    AND sqrt(list_dot_product(cast(embedding AS double[]),
                                              cast(embedding AS double[]))) > 0
                ) q
              )
            )
            WHERE rn <= 5
        """,
        "events_extremes": """
            WITH ranked AS (
              SELECT event_id, event_type, value,
                     row_number() OVER (PARTITION BY event_type
                       ORDER BY value DESC, event_id ASC) AS rh,
                     row_number() OVER (PARTITION BY event_type
                       ORDER BY value ASC, event_id ASC) AS rl
              FROM events
            )
            SELECT event_id, event_type, round(value, 4) AS value,
                   'high' AS direction
            FROM ranked WHERE rh <= 20
            UNION ALL
            SELECT event_id, event_type, round(value, 4), 'low'
            FROM ranked WHERE rl <= 20
        """,
        "events_percentiles": """
            SELECT event_type,
                   round(quantile_cont(value, 0.5), 4) AS p50,
                   round(quantile_cont(value, 0.95), 4) AS p95,
                   round(min(value), 4) AS vmin,
                   round(max(value), 4) AS vmax
            FROM events GROUP BY event_type
        """,
        "latest_event_per_user": """
            WITH last AS (SELECT user_id, max(ts) AS last_ts FROM events GROUP BY user_id)
            SELECT e.user_id, min(e.event_id) AS event_id
            FROM events e JOIN last l ON e.user_id = l.user_id AND e.ts = l.last_ts
            GROUP BY e.user_id, l.last_ts
        """,
        "ip_cidr_enrich": """
            WITH ips AS (
              SELECT o_orderkey AS ip_id,
                     '10.' || (o_orderkey % 250) || '.'
                       || ((o_orderkey * 7) % 250) || '.'
                       || ((o_orderkey % 249) + 1) AS ip,
                     167772160 + 65536 * (o_orderkey % 250)
                       + 256 * ((o_orderkey * 7) % 250)
                       + ((o_orderkey % 249) + 1) AS ipn
              FROM orders
            ),
            cidrs AS (
              SELECT '10.' || n_nationkey || '.0.0/16' AS cidr,
                     'net-' || n_nationkey AS label,
                     167772160 + 65536 * n_nationkey AS start,
                     65536 AS sz, 16 AS prefix
              FROM nation
              UNION ALL
              SELECT '10.0.0.0/8', 'corp', 167772160, 16777216, 8
            ),
            m AS (
              SELECT ip_id, ip, cidr, label,
                     row_number() OVER (
                       PARTITION BY ip_id ORDER BY prefix DESC
                     ) AS rn
              FROM ips JOIN cidrs ON ipn >= start AND ipn < start + sz
            )
            SELECT ip_id, ip, cidr, label FROM m WHERE rn = 1
        """,
        "feature_hash": """
            WITH toks AS (
              SELECT doc_id,
                     unnest(regexp_extract_all(lower(text), '[a-z0-9]{2,}')) AS term
              FROM documents
            ),
            hashed AS (
              SELECT doc_id,
                     cast(md5_number_upper('fh:' || term) % 1024 AS bigint) AS idx,
                     cast(md5_number_upper('fhs:' || term) % 2 AS bigint) * 2 - 1 AS sign
              FROM toks
            )
            SELECT doc_id, idx, cast(sum(sign) AS bigint) AS weight
            FROM hashed GROUP BY 1, 2 HAVING sum(sign) <> 0
        """,
        "quality_model_score": """
            WITH toks AS (
              SELECT doc_id,
                     unnest(regexp_extract_all(lower(text), '[a-z0-9]{2,}')) AS term
              FROM documents
            ),
            hashed AS (
              SELECT doc_id,
                     cast(md5_number_upper('fh:' || term) % 1024 AS bigint) AS idx,
                     cast(md5_number_upper('fhs:' || term) % 2 AS bigint) * 2 - 1 AS sign
              FROM toks
            ),
            feats AS (
              SELECT doc_id, idx, cast(sum(sign) AS bigint) AS weight
              FROM hashed GROUP BY 1, 2 HAVING sum(sign) <> 0
            ),
            model AS (
              SELECT i AS idx,
                     (cast(md5_number_upper('qw:' || i) % 2001 AS bigint) - 1000)
                       / 1000.0 AS w
              FROM range(1024) t(i)
            ),
            dots AS (
              SELECT f.doc_id, sum(f.weight * m.w) AS dot
              FROM feats f JOIN model m USING (idx) GROUP BY 1
            ),
            scored AS (
              SELECT d.doc_id,
                     round(1.0 / (1.0 + exp(-(coalesce(dot, 0) + 0.0))), 6)
                       AS score
              FROM documents d LEFT JOIN dots USING (doc_id)
            )
            SELECT doc_id, score, score >= 0.5 AS keep FROM scored
        """,
        "bloom_prefilter": """
            WITH members AS (
              SELECT cast(o_orderkey AS varchar) AS k
              FROM orders WHERE o_orderkey % 7 = 0
            ),
            pos AS (
              SELECT cast(md5_number_upper('bloom' || r.i || ':' || k)
                          % 4096 AS bigint) AS pos
              FROM members CROSS JOIN (VALUES (0),(1),(2)) r(i)
            ),
            bloom AS (
              SELECT pos // 32 AS word,
                     bit_or(1::BIGINT << cast(pos % 32 AS int)) AS bits
              FROM pos GROUP BY 1
            ),
            probes AS (
              SELECT o_orderkey AS key_id,
                     cast(md5_number_upper('bloom' || r.i || ':'
                          || cast(o_orderkey AS varchar)) % 4096 AS bigint) AS pos
              FROM orders CROSS JOIN (VALUES (0),(1),(2)) r(i)
            ),
            checked AS (
              SELECT p.key_id,
                     sum(CASE WHEN coalesce(b.bits, 0)
                              & (1::BIGINT << cast(p.pos % 32 AS int)) <> 0
                         THEN 1 ELSE 0 END) AS hits,
                     count(*) AS n
              FROM probes p LEFT JOIN bloom b ON b.word = p.pos // 32
              GROUP BY 1
            )
            SELECT key_id, hits = n AS might_contain FROM checked
        """,
        "domain_registrable": """
            SELECT o_orderkey AS host_id,
                   CASE cast(o_orderkey % 5 AS int)
                     WHEN 0 THEN 'www.evil-' || o_orderkey || '.co.uk'
                     WHEN 1 THEN 'cdn.evil-' || o_orderkey || '.com'
                     WHEN 2 THEN 'u' || o_orderkey || '.github.io'
                     WHEN 3 THEN 'evil-' || o_orderkey || '.zz'
                     ELSE 'github.io' END AS host,
                   CASE cast(o_orderkey % 5 AS int)
                     WHEN 0 THEN 'co.uk'
                     WHEN 1 THEN 'com'
                     WHEN 2 THEN 'github.io'
                     WHEN 3 THEN NULL
                     ELSE 'github.io' END AS suffix,
                   CASE cast(o_orderkey % 5 AS int)
                     WHEN 0 THEN 'evil-' || o_orderkey || '.co.uk'
                     WHEN 1 THEN 'evil-' || o_orderkey || '.com'
                     WHEN 2 THEN 'u' || o_orderkey || '.github.io'
                     ELSE NULL END AS registrable
            FROM orders
        """,
        "cms_user_counts": """
            WITH cells AS (
              SELECT r.i AS row,
                     cast(md5_number_upper('cms' || r.i || ':'
                          || cast(user_id AS varchar)) % 32 AS bigint) AS bucket,
                     count(*) AS n
              FROM events CROSS JOIN (VALUES (0),(1),(2)) r(i)
              GROUP BY 1, 2
            ),
            probes AS (
              SELECT DISTINCT user_id, r.i AS row,
                     cast(md5_number_upper('cms' || r.i || ':'
                          || cast(user_id AS varchar)) % 32 AS bigint) AS bucket
              FROM events CROSS JOIN (VALUES (0),(1),(2)) r(i)
            ),
            est AS (
              SELECT p.user_id, min(c.n) AS cms_count
              FROM probes p JOIN cells c USING (row, bucket)
              GROUP BY 1
            ),
            exact AS (SELECT user_id, count(*) AS exact_count FROM events GROUP BY 1)
            SELECT est.user_id, cms_count, exact_count
            FROM est JOIN exact USING (user_id)
        """,
        "text_unigram_logprob": """
            WITH toks AS (
              SELECT doc_id,
                     unnest(regexp_extract_all(lower(text), '[a-z0-9]{2,}')) AS term
              FROM documents
            ),
            tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
            cts AS (SELECT term, sum(tf) AS ct FROM tf GROUP BY 1),
            tot AS (SELECT sum(tf) AS total FROM tf)
            SELECT tf.doc_id,
                   cast(sum(tf.tf) AS bigint) AS n_tokens,
                   round(sum(tf.tf * ln(cts.ct / tot.total)) / sum(tf.tf), 6)
                     AS avg_logprob
            FROM tf JOIN cts USING (term) CROSS JOIN tot
            GROUP BY tf.doc_id
        """,
        "events_json_props": """
            WITH x AS (
              SELECT event_type,
                     cast(ks AS bigint) AS k
              FROM (
                SELECT event_type,
                       json_extract_string(props, '$.k') AS ks
                FROM events
              )
              WHERE ks IS NOT NULL AND regexp_matches(ks, '^-?[0-9]+$')
            )
            SELECT event_type,
                   cast(count(*) AS bigint) AS n,
                   cast(sum(k) AS bigint) AS sum_k,
                   round(avg(k), 6) AS avg_k,
                   cast(count(DISTINCT k) AS bigint) AS n_distinct_k
            FROM x
            GROUP BY event_type
        """,
        "search_ndcg": """
            WITH b2 AS (
              SELECT doc_id,
                     cast(len(regexp_extract_all(lower(text), '[a-z0-9]{2,}'))
                       AS bigint) AS dl,
                     regexp_extract_all(lower(text), '[a-z0-9]{2,}') AS toks
              FROM documents
            ),
            consts AS (
              SELECT cast(count(*) AS bigint) AS n,
                     cast(sum(dl) AS bigint) AS tdl
              FROM b2
            ),
            tf AS (
              SELECT doc_id, dl, term, cast(count(*) AS bigint) AS tf
              FROM (
                SELECT doc_id, dl,
                       unnest(list_filter(toks,
                         t -> list_contains(['merge', 'stream', 'vector'], t)))
                         AS term
                FROM b2
              ) GROUP BY 1, 2, 3
            ),
            dfr AS (SELECT term, cast(count(*) AS bigint) AS df
                    FROM tf GROUP BY term),
            contrib AS (
              SELECT tf.doc_id,
                     ln(1.0 + (n - df + 0.5) / (df + 0.5))
                       * (tf * 2.2)
                       / (tf + 1.2 * (0.25 + 0.75 * (dl * n) / tdl)) AS c
              FROM tf JOIN dfr USING (term) CROSS JOIN consts
            ),
            scored AS (
              SELECT doc_id, round(sum(c), 6) AS score
              FROM contrib GROUP BY doc_id
            ),
            ranked AS (
              SELECT doc_id, rk FROM (
                SELECT doc_id, row_number() OVER (
                  ORDER BY score DESC, doc_id ASC
                ) AS rk FROM scored
              ) WHERE rk <= 10
            ),
            rel AS (
              SELECT doc_id,
                     (CASE WHEN list_contains(toks, 'merge')
                           THEN 1 ELSE 0 END
                      + CASE WHEN list_contains(toks, 'stream')
                             THEN 1 ELSE 0 END
                      + CASE WHEN list_contains(toks, 'vector')
                             THEN 1 ELSE 0 END) AS rel
              FROM b2
            ),
            dcg AS (
              SELECT coalesce(sum((pow(2.0, coalesce(rel.rel, 0)) - 1.0)
                       / log2(cast(rk AS double) + 1.0)), 0.0) AS d
              FROM ranked LEFT JOIN rel USING (doc_id)
            ),
            ideal AS (
              SELECT rel, row_number() OVER (
                ORDER BY rel DESC, doc_id ASC
              ) AS pos
              FROM rel WHERE rel > 0
            ),
            idcg AS (
              SELECT coalesce(sum((pow(2.0, rel) - 1.0)
                       / log2(cast(pos AS double) + 1.0)), 0.0) AS i
              FROM ideal WHERE pos <= 10
            )
            SELECT cast(10 AS int) AS k,
                   round(d, 6) AS dcg,
                   round(i, 6) AS idcg,
                   CASE WHEN i > 0 THEN round(d / i, 6) END AS ndcg
            FROM dcg CROSS JOIN idcg
        """,
        "search_rank_eval": _rank_eval_sql,
        # Flesch reading-ease: vowel-run syllables, [a-z]+ words,
        # [.!?]+ sentence runs floored at 1; exact integer counts,
        # round-6 linear combination (see q_text_readability).
        "text_readability": """
            WITH c AS (
              SELECT doc_id,
                     cast(len(regexp_extract_all(lower(text), '[a-z]+'))
                       AS bigint) AS n_words,
                     cast(greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
                       AS bigint) AS n_sentences,
                     cast(len(regexp_extract_all(lower(text), '[aeiouy]+'))
                       AS bigint) AS n_syllables
              FROM documents
            )
            SELECT doc_id, n_words, n_sentences, n_syllables,
                   CASE WHEN n_words > 0 THEN
                     round(206.835
                           - 1.015 * (cast(n_words AS double)
                                      / cast(n_sentences AS double))
                           - 84.6 * (cast(n_syllables AS double)
                                     / cast(n_words AS double)), 6)
                   END AS flesch
            FROM c
        """,
        # Efraimidis-Spirakis weighted sample: md5-bucket u, priority
        # -ln(u)/w round-6, (priority, doc_id) top-50 cut (see
        # q_sample_weighted).
        "sample_weighted": """
            WITH w AS (
              SELECT doc_id, cast(length(text) AS double) AS wt,
                     cast(md5_number_upper('wsample:'
                            || cast(doc_id AS varchar)) % 1000000 + 1
                          AS double) / 1000001.0 AS u
              FROM documents
              WHERE length(text) > 0
            ),
            p AS (SELECT doc_id, round(-ln(u) / wt, 6) AS priority FROM w),
            r AS (
              SELECT doc_id, priority, row_number() OVER (
                ORDER BY priority ASC, doc_id ASC
              ) AS rk
              FROM p
            )
            SELECT doc_id, priority, cast(rk AS int) AS rk
            FROM r WHERE rk <= 50
        """,
        # Hour-of-day seasonality: integer chi-square identity
        # (24*sum(c^2) - n^2)/n, smallest-hour peak tie-break (see
        # q_events_seasonality).
        "events_seasonality": """
            WITH c AS (
              SELECT event_type AS g, cast(hour(ts) AS int) AS h,
                     cast(count(*) AS bigint) AS c
              FROM events GROUP BY 1, 2
            ),
            m AS (SELECT g, max(c) AS cmax FROM c GROUP BY g),
            a AS (
              SELECT c.g, cast(sum(c.c) AS bigint) AS n,
                     cast(count(*) AS int) AS nh,
                     min(CASE WHEN c.c = m.cmax THEN c.h END) AS peak_hour,
                     max(m.cmax) AS peak,
                     cast(sum(c.c * c.c) AS bigint) AS sc2
              FROM c JOIN m USING (g) GROUP BY c.g
            )
            SELECT g AS event_type, n, nh AS n_hours_active,
                   cast(peak_hour AS int) AS peak_hour,
                   round(cast(peak AS double) / cast(n AS double), 6)
                     AS peak_share,
                   round(cast(24 * sc2 - n * n AS double)
                         / cast(n AS double), 6) AS chi2
            FROM a
        """,
        # Global transitivity over the 3-clique+pendant gadgets is
        # ANALYTIC: each disjoint gadget contributes 3 closed wedges,
        # 1 triangle, 5 wedges (degrees 2,2,3,1) — see
        # q_graph_transitivity.
        "graph_transitivity": """
            WITH g AS (
              SELECT cast(count(*) AS bigint) AS ng
              FROM orders WHERE o_orderkey % 13 = 0
            )
            SELECT cast(3 * ng AS bigint) AS n_closed_wedges,
                   ng AS n_triangles,
                   cast(5 * ng AS bigint) AS n_wedges,
                   CASE WHEN ng > 0 THEN
                     round(cast(3 * ng AS double)
                           / cast(5 * ng AS double), 6)
                   END AS transitivity
            FROM g
        """,
        # Rich-club curve over the disjoint gadgets is ANALYTIC (see
        # q_graph_rich_club): spectrum {1,2}, phi(1) = 3G/C(3G,2),
        # phi(2) = 0 across G clique corners.
        "graph_rich_club": """
            WITH g AS (
              SELECT cast(count(*) AS bigint) AS ng
              FROM orders WHERE o_orderkey % 13 = 0
            )
            SELECT cast(1 AS bigint) AS k,
                   cast(3 * ng AS bigint) AS n_club,
                   cast(3 * ng AS bigint) AS e_club,
                   round(cast(3 * ng AS double)
                         / cast((3 * ng * (3 * ng - 1)) // 2 AS double), 6)
                     AS phi
            FROM g WHERE 3 * ng >= 2
            UNION ALL
            SELECT cast(2 AS bigint), ng, cast(0 AS bigint), 0.0
            FROM g WHERE ng >= 2
        """,
        # Average neighbor degree per gadget node is analytic: corners
        # see (2+3)/2, the hub (2+2+1)/3, the pendant 3/1 (see
        # q_graph_avg_nbr_deg).
        "graph_avg_nbr_deg": """
            WITH ks AS (
              SELECT cast(o_orderkey * 3 AS bigint) AS k3
              FROM orders WHERE o_orderkey % 13 = 0
            ),
            o(i, deg, s) AS (VALUES
              (0, 2, 5), (1, 2, 5), (2, 3, 5), (3, 1, 3)
            )
            SELECT k3 + i AS id, cast(deg AS bigint) AS deg,
                   round(cast(s AS double) / cast(deg AS double), 6)
                     AS avg_nbr_deg
            FROM ks CROSS JOIN o
        """,
        # k-anonymity audit: GROUP BY + HAVING < k (see
        # q_events_k_anonymity).
        "events_k_anonymity": """
            SELECT user_id, event_type, cast(hour(ts) AS int) AS hour,
                   cast(count(*) AS bigint) AS n
            FROM events
            GROUP BY user_id, event_type, hour(ts)
            HAVING count(*) < 5
        """,
        # 10%-trimmed mean: identical rank/trim/decimal-sum chain (see
        # q_events_trimmed_mean).
        "events_trimmed_mean": """
            WITH r AS (
              SELECT event_type AS g,
                     cast(value AS decimal(38,6)) AS v,
                     row_number() OVER (
                       PARTITION BY event_type
                       ORDER BY value ASC, event_id ASC
                     ) AS rn,
                     count(*) OVER (PARTITION BY event_type) AS n
              FROM events WHERE value IS NOT NULL
            ),
            t AS (SELECT *, (1 * n) // 10 AS tt FROM r),
            k AS (
              SELECT g, cast(max(n) AS bigint) AS n,
                     cast(max(tt) AS bigint) AS t,
                     sum(v) AS s, cast(count(*) AS bigint) AS c
              FROM t WHERE rn > tt AND rn <= n - tt
              GROUP BY g
            )
            SELECT g AS event_type, n, t AS n_trimmed_each_side,
                   round(cast(s AS double) / cast(c AS double), 6)
                     AS trimmed_mean
            FROM k
        """,
        # l-diversity: GROUP BY + HAVING count(DISTINCT sensitive) < l
        # (see q_events_l_diversity).
        "events_l_diversity": """
            SELECT user_id, event_type, cast(hour(ts) AS int) AS hour,
                   cast(count(*) AS bigint) AS n,
                   cast(count(DISTINCT day(ts)) AS bigint) AS n_sensitive
            FROM events
            GROUP BY user_id, event_type, hour(ts)
            HAVING count(DISTINCT day(ts)) < 3
        """,
        # Sliding-window rate profile: integer-second RANGE frame
        # shared with the per-user aggregate (see q_events_rate_peaks).
        "events_rate_peaks": """
            WITH r AS (
              SELECT user_id,
                     count(*) OVER (
                       PARTITION BY user_id
                       ORDER BY epoch_us(ts) // 1000000
                       RANGE BETWEEN 86399 PRECEDING AND CURRENT ROW
                     ) AS c
              FROM events WHERE ts IS NOT NULL
            )
            SELECT user_id, cast(count(*) AS bigint) AS n_events,
                   cast(max(c) AS bigint) AS peak_rate,
                   cast(count(*) FILTER (WHERE c > 3) AS bigint) AS n_over
            FROM r GROUP BY user_id
        """,
        "hll_user_overlap": _hll_overlap_oracle_sql(),
        # Kaplan-Meier: identical duration/risk/ln-sum chain (see
        # q_events_survival).
        "events_survival": """
            WITH ev AS (
              SELECT user_id AS u, event_type AS t, epoch_us(ts) AS us
              FROM events WHERE ts IS NOT NULL
            ),
            t0 AS (SELECT u, min(us) AS t0 FROM ev
                   WHERE t = 'signup' GROUP BY u),
            conv AS (
              SELECT ev.u, min(us) AS t1 FROM ev JOIN t0 USING (u)
              WHERE t = 'purchase' AND us >= t0 GROUP BY ev.u
            ),
            hz AS (SELECT max(us) AS hz FROM ev),
            subj AS (
              SELECT (coalesce(t1, hz) - t0) // 86400000000 AS t_day,
                     CASE WHEN t1 IS NOT NULL THEN 1 ELSE 0 END AS e
              FROM t0 LEFT JOIN conv USING (u) CROSS JOIN hz
            ),
            days AS (
              SELECT t_day, cast(sum(e) AS bigint) AS d,
                     cast(sum(1 - e) AS bigint) AS c
              FROM subj GROUP BY t_day
            ),
            risk AS (
              SELECT *, sum(d + c) OVER (
                ORDER BY t_day DESC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
              ) AS n FROM days
            ),
            curve AS (
              SELECT *,
                sum(CASE WHEN d > 0 AND d < n
                         THEN ln(cast(n - d AS double) / cast(n AS double))
                         ELSE 0.0 END) OVER (
                  ORDER BY t_day ASC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                ) AS lns,
                max(CASE WHEN d > 0 AND d >= n THEN 1 ELSE 0 END) OVER (
                  ORDER BY t_day ASC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                ) AS dead
              FROM risk
            )
            SELECT cast(t_day AS bigint) AS t_day,
                   cast(n AS bigint) AS n_at_risk,
                   d AS n_events, c AS n_censored,
                   CASE WHEN dead = 1 THEN 0.0
                        ELSE round(exp(lns), 6) END AS survival
            FROM curve
        """,
        # percent_rank is identically defined in both engines; NULLs
        # filtered (NULLS FIRST/LAST divergence) — see
        # q_events_value_pct.
        "events_value_pct": """
            SELECT event_id, event_type,
                   round(percent_rank() OVER (
                     PARTITION BY event_type ORDER BY value ASC
                   ), 6) AS pct
            FROM events WHERE value IS NOT NULL
        """,
        # Reciprocal best match: the batch_topk candidate chain on the
        # %7 subset, self pairs dropped, per-side top-1, reversed-pair
        # equi-join (see q_similarity_mutual_best).
        "similarity_mutual_best": """
            WITH sub AS (
              SELECT vec_id, embedding FROM embeddings
              WHERE vec_id % 7 = 0
                AND sqrt(list_dot_product(cast(embedding AS double[]),
                                          cast(embedding AS double[]))) > 0
            ),
            scored AS (
              SELECT q.vec_id AS query_id, e.vec_id,
                     round(list_cosine_similarity(
                       cast(e.embedding AS double[]),
                       cast(q.embedding AS double[])), 3) AS cosine
              FROM sub e CROSS JOIN sub q
            ),
            topk AS (
              SELECT query_id, vec_id, cosine FROM (
                SELECT *, row_number() OVER (PARTITION BY query_id
                  ORDER BY cosine DESC, vec_id ASC) AS rn
                FROM scored
              ) WHERE rn <= 5
            ),
            best AS (
              SELECT query_id, vec_id, cosine FROM (
                SELECT *, row_number() OVER (PARTITION BY query_id
                  ORDER BY cosine DESC, vec_id ASC) AS rn
                FROM topk WHERE query_id <> vec_id
              ) WHERE rn = 1
            )
            SELECT b1.query_id, b1.vec_id, b1.cosine
            FROM best b1 JOIN best b2
              ON b1.query_id = b2.vec_id AND b1.vec_id = b2.query_id
            WHERE b1.query_id < b1.vec_id
        """,
        # Calibration over the synthetic calibrated scorer: identical
        # fixed-point bin/Brier chain (see q_eval_calibration).
        "eval_calibration": """
            WITH s AS (
              SELECT md5_number_upper('cal_p:' || cast(doc_id AS varchar))
                       % 1000000 AS ba,
                     md5_number_upper('cal_y:' || cast(doc_id AS varchar))
                       % 1000000 AS bb
              FROM documents
            ),
            r AS (
              SELECT cast(round((cast(ba AS double) / 1000000.0) * 1000000)
                       AS bigint) AS m,
                     CASE WHEN bb < ba THEN 1 ELSE 0 END AS y
              FROM s
            ),
            b AS (
              SELECT least(m // 100000, 9) AS bin, m, y,
                     (m - y * 1000000) AS e
              FROM r
            )
            SELECT cast(bin AS int) AS bin,
                   cast(count(*) AS bigint) AS n,
                   round(sum(m) / (count(*) * 1e6), 6) AS mean_pred,
                   round(cast(sum(y) AS double)
                         / cast(count(*) AS double), 6) AS frac_pos,
                   round(cast(sum(e * e) AS double)
                         / (cast(count(*) AS double) * 1e12), 6) AS brier
            FROM b GROUP BY bin
        """,
        # Degree histogram over the gadgets is analytic (see
        # q_graph_degree_hist).
        "graph_degree_hist": """
            WITH g AS (
              SELECT cast(count(*) AS bigint) AS ng
              FROM orders WHERE o_orderkey % 13 = 0
            )
            SELECT cast(1 AS bigint) AS deg, ng AS n_nodes FROM g
            UNION ALL
            SELECT 2, cast(2 * ng AS bigint) FROM g
            UNION ALL
            SELECT 3, ng FROM g
        """,
        # Hill tail MLE over the gadgets is analytic: sum ln =
        # 2G·ln(1) + G·ln(3/2) (see q_graph_hill_tail).
        "graph_hill_tail": """
            WITH g AS (
              SELECT cast(count(*) AS bigint) AS ng
              FROM orders WHERE o_orderkey % 13 = 0
            )
            SELECT cast(2 AS int) AS d_min,
                   cast(3 * ng AS bigint) AS n_tail,
                   round(1.0 + cast(3 * ng AS double)
                         / (cast(ng AS double)
                            * ln(cast(3 AS double) / cast(2 AS double))), 6)
                     AS alpha
            FROM g
        """,
        "events_benford": """
            WITH digits AS (
              SELECT event_type AS "group",
                     cast(left(cast(cast(round(value * 100) AS bigint)
                                    AS varchar), 1) AS integer) AS d,
                     count(*) AS c
              FROM events
              WHERE value IS NOT NULL AND value >= 0.01
              GROUP BY 1, 2
            ),
            terms AS (
              SELECT "group", c,
                     c * c / (ln((d + 1.0) / d) / ln(10.0)) AS cc_over_p
              FROM digits
            )
            SELECT "group",
                   cast(sum(c) AS bigint) AS n,
                   round(sum(cc_over_p) / sum(c) - sum(c), 6) AS chi2
            FROM terms GROUP BY 1
        """,
        "jaccard_prefix_join": """
            -- independent brute-force oracle: ALL pairs sharing any
            -- token, exact integer threshold 10*inter >= 9*union.
            -- The Spark side runs the prefix-filter algorithm; the
            -- no-false-negative theorem makes the outputs identical.
            WITH toks AS (
              SELECT DISTINCT doc_id,
                     unnest(regexp_extract_all(lower(text),
                                               '[a-z0-9]{2,}')) AS term
              FROM documents
            ),
            sz AS (SELECT doc_id, count(*) AS n FROM toks GROUP BY 1),
            inter AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                     count(*) AS n_inter
              FROM toks a
              JOIN toks b ON a.term = b.term AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            )
            SELECT id_a, id_b,
                   cast(n_inter AS bigint) AS n_inter,
                   cast(sa.n + sb.n - n_inter AS bigint) AS n_union,
                   round(n_inter / (sa.n + sb.n - n_inter), 6) AS jaccard
            FROM inter
            JOIN sz sa ON sa.doc_id = id_a
            JOIN sz sb ON sb.doc_id = id_b
            WHERE 10 * n_inter >= 9 * (sa.n + sb.n - n_inter)
        """,
        "dedup_bow": """
            WITH twins AS (
              SELECT doc_id + 1000000000000 AS doc_id,
                     array_to_string(
                       list_reverse(regexp_extract_all(lower(text),
                                                       '[a-z0-9]{2,}')),
                       ' ') AS text
              FROM documents WHERE doc_id % 20 = 0
            ),
            all_docs AS (
              SELECT doc_id, text FROM documents
              UNION ALL SELECT doc_id, text FROM twins
            ),
            h AS (
              SELECT doc_id,
                     md5(array_to_string(
                           list_sort(regexp_extract_all(lower(text),
                                                        '[a-z0-9]{2,}')),
                           ' ')) AS bow_hash,
                     len(regexp_extract_all(lower(text),
                                            '[a-z0-9]{2,}')) AS nt
              FROM all_docs
            )
            SELECT bow_hash, count(*) AS n_copies, min(doc_id) AS keep_id
            FROM h WHERE nt > 0
            GROUP BY 1 HAVING count(*) > 1
        """,
        "curriculum_order": """
            WITH sc AS (
              SELECT doc_id AS key,
                     cast(len(regexp_extract_all(lower(text),
                                                 '[a-z0-9]{2,}'))
                          AS bigint) AS difficulty
              FROM documents
            ),
            smp AS (
              SELECT * FROM sc
              WHERE md5_number_upper('curriculum:'
                      || cast(key AS varchar)) % 1000000 < 50000
            ),
            r AS (
              SELECT difficulty,
                     row_number() OVER (ORDER BY difficulty ASC, key ASC)
                       AS rn,
                     count(*) OVER () AS n
              FROM smp
            ),
            b AS (
              SELECT max(CASE WHEN rn = (1 * n + 3) // 4
                              THEN difficulty END) AS b1,
                     max(CASE WHEN rn = (2 * n + 3) // 4
                              THEN difficulty END) AS b2,
                     max(CASE WHEN rn = (3 * n + 3) // 4
                              THEN difficulty END) AS b3
              FROM r
            )
            SELECT sc.key, sc.difficulty,
                   cast(1
                        + (CASE WHEN b.b1 IS NOT NULL
                                 AND sc.difficulty > b.b1
                                THEN 1 ELSE 0 END)
                        + (CASE WHEN b.b2 IS NOT NULL
                                 AND sc.difficulty > b.b2
                                THEN 1 ELSE 0 END)
                        + (CASE WHEN b.b3 IS NOT NULL
                                 AND sc.difficulty > b.b3
                                THEN 1 ELSE 0 END)
                     AS integer) AS bucket
            FROM sc CROSS JOIN b
        """,
        "text_bigram_logprob": """
            WITH tk AS (
              SELECT doc_id,
                     regexp_extract_all(lower(text), '[a-z0-9]{2,}') AS toks
              FROM documents
            ),
            bg AS (
              SELECT doc_id,
                     unnest(list_transform(range(2, len(toks) + 1),
                            i -> toks[i - 1] || ' ' || toks[i])) AS bg
              FROM tk WHERE len(toks) >= 2
            ),
            tf AS (SELECT doc_id, bg, count(*) AS tf FROM bg GROUP BY 1, 2),
            cts AS (SELECT bg, sum(tf) AS ct FROM tf GROUP BY 1),
            ctx AS (
              SELECT split_part(bg, ' ', 1) AS w1, sum(ct) AS ctx
              FROM cts GROUP BY 1
            )
            SELECT tf.doc_id,
                   cast(sum(tf.tf) AS bigint) AS n_bigrams,
                   round(sum(tf.tf * ln(cts.ct / ctx.ctx)) / sum(tf.tf), 6)
                     AS avg_logprob2
            FROM tf
            JOIN cts USING (bg)
            JOIN ctx ON split_part(tf.bg, ' ', 1) = ctx.w1
            GROUP BY tf.doc_id
        """,
        "source_datasheet": """
            WITH base AS (
              SELECT source,
                     cast(count(*) AS bigint) AS n_docs,
                     cast(count(DISTINCT md5(text)) AS bigint)
                       AS n_distinct_texts,
                     cast(count(DISTINCT lang) AS bigint) AS n_langs
              FROM documents GROUP BY 1
            ),
            vb AS (
              SELECT source, cast(count(DISTINCT t) AS bigint) AS vocab_size
              FROM (
                SELECT source,
                       unnest(regexp_extract_all(lower(text),
                                                 '[a-z0-9]{2,}')) AS t
                FROM documents
              )
              GROUP BY 1
            )
            SELECT base.source, base.n_docs, base.n_distinct_texts,
                   round(1.0 - base.n_distinct_texts / base.n_docs, 6)
                     AS dup_rate,
                   base.n_langs,
                   coalesce(vb.vocab_size, 0) AS vocab_size
            FROM base LEFT JOIN vb USING (source)
        """,
        "dsir_weights": _dsir_weights_sql(512)
        + """
            SELECT doc_id, n_feats, log_weight FROM w
        """,
        "dsir_resample": _dsir_weights_sql(512)
        + """
            SELECT doc_id, n_feats, log_weight,
                   round(log_weight
                         - ln(-ln((md5_number_upper('gumbel:'
                                     || cast(doc_id AS varchar)) % 1000000
                                   + 0.5) / 1000000.0)),
                         6) AS gumbel_key
            FROM w
            ORDER BY gumbel_key DESC, doc_id
            LIMIT 100
        """,
        "graph_scc": """
            WITH RECURSIVE ks AS (
              SELECT o_orderkey * 10 AS base FROM orders WHERE o_orderkey % 13 = 0
            ),
            e AS (
              SELECT base + p.a AS src, base + p.b AS dst
              FROM ks CROSS JOIN (VALUES
                (0,1),(1,2),(2,0),(2,3),(3,4),(4,5),(5,4),
                (6,8),(6,9),(8,7),(9,7)) p(a, b)
            ),
            reach(s, d) AS (
              SELECT src, dst FROM e
              UNION
              SELECT r.s, e2.dst FROM reach r JOIN e e2 ON e2.src = r.d
            ),
            nodes AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
            mut AS (
              SELECT r1.s AS a, r1.d AS b
              FROM reach r1 JOIN reach r2 ON r1.s = r2.d AND r1.d = r2.s
            )
            SELECT id, min(m) AS scc_id FROM (
              SELECT id, id AS m FROM nodes
              UNION ALL
              SELECT a, b FROM mut
            ) t GROUP BY id
        """,
        "graph_random_walks": _walks_cte_sql(4, 2)
        + """
            SELECT walk_id, start_id, step, node FROM walks
        """,
        "graph_walk_pmi": _walks_cte_sql(4, 2)
        + """,
            co AS (
              SELECT a.node AS node_id, b.node AS context,
                     count(*) AS n_co
              FROM walks a JOIN walks b USING (walk_id)
              WHERE a.step <> b.step AND abs(a.step - b.step) <= 2
              GROUP BY 1, 2
            ),
            marg AS (SELECT node_id, sum(n_co) AS m FROM co GROUP BY 1),
            tot AS (SELECT sum(n_co) AS t FROM co)
            SELECT co.node_id, co.context, co.n_co,
                   round(ln(cast(co.n_co AS double) * cast(tot.t AS double)
                            / (cast(ma.m AS double) * cast(mc.m AS double))),
                         6) AS ppmi
            FROM co
            JOIN marg ma USING (node_id)
            JOIN marg mc ON mc.node_id = co.context
            CROSS JOIN tot
            WHERE co.n_co * tot.t > ma.m * mc.m
        """,
        "graph_hits": _hits_oracle_sql(3),
        "graph_katz": _katz_oracle_sql(3),
        "graph_louvain": _louvain_oracle_sql(4),
        "graph_louvain_weighted": _louvain_oracle_sql(4, weighted=True),
        "graph_modularity": _modularity_oracle_sql(4),
        "similarity_sq_topk": """
            WITH p AS (
              SELECT vec_id, cast(embedding AS double[]) AS v FROM embeddings
            ),
            nz AS (
              SELECT vec_id, v FROM p
              WHERE sqrt(list_sum(list_transform(v, x -> x * x))) > 0
            ),
            s AS (
              SELECT max(list_max(list_transform(v, x -> abs(x)))) AS s
              FROM nz
            ),
            rr AS (SELECT cast(127.0 AS double) / s AS r FROM s),
            q AS (
              SELECT cast(embedding AS double[]) AS qv
              FROM embeddings WHERE vec_id = 0
            ),
            qq AS (
              SELECT list_transform(
                       qv,
                       x -> greatest(-127.0, least(127.0,
                              floor(x * rr.r + 0.5)))) AS qq
              FROM q CROSS JOIN rr
            ),
            scored AS (
              SELECT vec_id, v,
                     list_inner_product(
                       list_transform(
                         v,
                         x -> greatest(-127.0, least(127.0,
                                floor(x * rr.r + 0.5)))),
                       qq.qq) AS aq
              FROM nz CROSS JOIN rr CROSS JOIN qq
            ),
            cand AS (
              SELECT vec_id, v FROM scored ORDER BY aq DESC, vec_id LIMIT 40
            )
            SELECT vec_id,
                   round(list_cosine_similarity(v, (SELECT qv FROM q)), 3)
                     AS cosine
            FROM cand
            ORDER BY cosine DESC, vec_id
            LIMIT 10
        """,
        "events_anomaly": """
            WITH s AS (
              SELECT event_type, avg(value) AS mu,
                     stddev_pop(value) AS sigma
              FROM events GROUP BY event_type
            ),
            sc AS (
              SELECT e.event_id, e.event_type, e.value,
                     round(CASE WHEN s.sigma > 0
                                THEN (e.value - s.mu) / s.sigma
                                ELSE 0.0 END, 3) AS z
              FROM events e JOIN s USING (event_type)
            )
            SELECT event_id, event_type, value, z FROM sc
            ORDER BY abs(z) DESC, event_id ASC LIMIT 20
        """,
        "kmv_distinct_users": """
            WITH h AS (
              SELECT DISTINCT
                     md5_number_upper('kmv:' || cast(user_id AS varchar)) AS hu
              FROM events WHERE user_id IS NOT NULL
            ),
            topk AS (SELECT hu FROM h ORDER BY hu LIMIT 256),
            agg AS (
              SELECT count(*) AS n_hashes, max(cast(hu AS double)) AS hk
              FROM topk
            )
            SELECT n_hashes,
                   round(CASE WHEN n_hashes < 256
                              THEN cast(n_hashes AS double)
                              ELSE cast(4703919738795935662080 AS double) / hk
                         END, 3) AS est_distinct
            FROM agg
        """,
        "hll_distinct_users": _hll_oracle_sql(),
        "events_percentiles_exact": """
            WITH r AS (
              SELECT event_type, value AS v,
                     row_number() OVER (PARTITION BY event_type
                                        ORDER BY value ASC, event_id ASC) AS rn,
                     count(*) OVER (PARTITION BY event_type) AS n
              FROM events WHERE value IS NOT NULL
            )
            SELECT event_type, max(n) AS n,
                   max(CASE WHEN rn = (1 * n + 1) // 2
                            THEN v END) AS p50,
                   max(CASE WHEN rn = (9 * n + 9) // 10
                            THEN v END) AS p90,
                   max(CASE WHEN rn = (99 * n + 99) // 100
                            THEN v END) AS p99
            FROM r GROUP BY event_type
        """,
        "embeddings_kmeans": _kmeans_oracle_sql(),
        "semantic_dedup": _semantic_dedup_oracle_sql(),
        "transcript_stats": f"""
            WITH tr AS ({_SYNTH_TRANSCRIPTS_SQL}),
            g AS (
              SELECT conv_id, turn_idx, role, tool,
                     length(text) AS chars, epoch,
                     epoch - lag(epoch) OVER (PARTITION BY conv_id
                                              ORDER BY turn_idx) AS gap
              FROM tr
            )
            SELECT conv_id,
                   count(*) AS n_turns,
                   count(*) FILTER (WHERE role = 'user') AS n_user,
                   count(*) FILTER (WHERE role = 'assistant') AS n_assistant,
                   count(*) FILTER (WHERE role = 'tool') AS n_tool,
                   count(DISTINCT tool) AS n_distinct_tools,
                   cast(sum(chars) AS bigint) AS total_chars,
                   max(epoch) - min(epoch) AS duration_s,
                   round(avg(gap), 3) AS mean_gap_s,
                   arg_max(role, turn_idx) AS final_role
            FROM g GROUP BY conv_id
        """,
        "conv_dedup_exact": f"""
            WITH tr AS ({_SYNTH_TRANSCRIPTS_SQL}),
            corpus AS (
              SELECT conv_id, turn_idx, role, text FROM tr
              UNION ALL
              SELECT conv_id || '_dup', turn_idx, role, text
              FROM tr WHERE cast(conv_id AS bigint) % 13 = 0
              UNION ALL
              SELECT conv_id || '_near', turn_idx, role,
                     CASE WHEN turn_idx = 1 THEN 'RETRY ' || text
                          ELSE text END
              FROM tr WHERE cast(conv_id AS bigint) % 17 = 0
            ),
            fp AS (
              SELECT conv_id, count(*) AS n_turns,
                     md5(string_agg(coalesce(role, '') || chr(31)
                                    || coalesce(text, ''),
                                    chr(30) ORDER BY turn_idx))
                       AS fingerprint
              FROM corpus GROUP BY conv_id
            ),
            canon AS (
              SELECT fingerprint, min(conv_id) AS canonical_conv_id
              FROM fp GROUP BY 1
            )
            SELECT conv_id, n_turns, fingerprint, canonical_conv_id,
                   conv_id <> canonical_conv_id AS is_dup
            FROM fp JOIN canon USING (fingerprint)
        """,
        "conv_near_dup": f"""
            WITH tr AS ({_SYNTH_TRANSCRIPTS_SQL}),
            corpus AS (
              SELECT conv_id, turn_idx, role, text FROM tr
              UNION ALL
              SELECT conv_id || '_dup', turn_idx, role, text
              FROM tr WHERE cast(conv_id AS bigint) % 13 = 0
              UNION ALL
              SELECT conv_id || '_near', turn_idx, role,
                     CASE WHEN turn_idx = 1 THEN 'RETRY ' || text
                          ELSE text END
              FROM tr WHERE cast(conv_id AS bigint) % 17 = 0
            ),
            th AS (
              SELECT DISTINCT conv_id,
                     md5(coalesce(role, '') || chr(31)
                         || coalesce(text, '')) AS th
              FROM corpus
            ),
            sz AS (SELECT conv_id, count(*) AS n FROM th GROUP BY 1),
            co AS (
              SELECT a.conv_id AS conv_a, b.conv_id AS conv_b,
                     count(*) AS n_common
              FROM th a JOIN th b ON a.th = b.th AND a.conv_id < b.conv_id
              GROUP BY 1, 2
            )
            SELECT conv_a, conv_b, n_common, sa.n AS n_a, sb.n AS n_b,
                   round(cast(n_common AS double)
                         / (sa.n + sb.n - n_common), 6) AS jaccard
            FROM co JOIN sz sa ON sa.conv_id = co.conv_a
                    JOIN sz sb ON sb.conv_id = co.conv_b
            WHERE cast(n_common AS double) / (sa.n + sb.n - n_common) >= 0.6
        """,
        "sft_pairs": f"""
            WITH tr AS ({_SYNTH_TRANSCRIPTS_SQL}),
            g AS (
              SELECT conv_id, turn_idx AS prompt_turn_idx, role,
                     text AS prompt,
                     lead(role) OVER w AS next_role,
                     lead(text) OVER w AS response
              FROM tr
              WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
            )
            SELECT conv_id, prompt_turn_idx, prompt, response,
                   coalesce(length(prompt), 0) AS n_prompt_chars,
                   coalesce(length(response), 0) AS n_response_chars
            FROM g
            WHERE role = 'user' AND next_role = 'assistant'
              AND coalesce(length(prompt), 0) >= 1
              AND coalesce(length(response), 0) >= 1
        """,
        "validate_traces": f"""
            WITH tr AS ({_SYNTH_TRANSCRIPTS_SQL}),
            g AS (
              SELECT conv_id, turn_idx, role, text,
                     lag(role) OVER (PARTITION BY conv_id
                                     ORDER BY turn_idx) AS prev_role
              FROM tr
            ),
            checks AS (
              SELECT conv_id,
                     count(*) AS n_turns,
                     arg_min(role, turn_idx) = 'user' AS starts_with_user,
                     arg_max(role, turn_idx) = 'assistant'
                       AS ends_with_assistant,
                     count(*) FILTER (WHERE role = prev_role) = 0
                       AS no_repeated_role,
                     count(*) FILTER (WHERE role = 'tool'
                                        AND (prev_role IS NULL
                                             OR prev_role <> 'assistant'))
                       = 0 AS tool_after_assistant,
                     (min(turn_idx) = 1 AND max(turn_idx) = count(*)
                      AND count(DISTINCT turn_idx) = count(*))
                       AS dense_turn_idx,
                     count(*) FILTER (WHERE text IS NULL
                                        OR length(text) = 0) = 0
                       AS no_empty_text
              FROM g GROUP BY conv_id
            )
            SELECT conv_id, n_turns, starts_with_user, ends_with_assistant,
                   no_repeated_role, tool_after_assistant, dense_turn_idx,
                   no_empty_text,
                   (starts_with_user AND ends_with_assistant
                    AND no_repeated_role AND tool_after_assistant
                    AND dense_turn_idx AND no_empty_text) AS is_valid
            FROM checks
        """,
        # Role-handoff latency: epoch-integer gaps over the turn order,
        # integer sums/max, one round-6 mean (see q_transcript_latency).
        "transcript_latency": f"""
            WITH tr AS ({_SYNTH_TRANSCRIPTS_SQL}),
            t AS (
              SELECT lag(role) OVER w AS from_role,
                     role AS to_role,
                     epoch - lag(epoch) OVER w AS gap
              FROM tr
              WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
            )
            SELECT from_role, to_role,
                   cast(count(*) AS bigint) AS n,
                   round(sum(gap) / count(*), 6) AS mean_s,
                   cast(max(gap) AS bigint) AS max_s
            FROM t WHERE from_role IS NOT NULL AND gap IS NOT NULL
            GROUP BY from_role, to_role
        """,
        # Per-tool profile over the shared synthetic-transcripts CTE:
        # lead-window stall gaps, NULL-safe mean (see
        # q_transcript_tool_profile).
        "transcript_tool_profile": f"""
            WITH tr AS ({_SYNTH_TRANSCRIPTS_SQL}),
            t AS (
              SELECT role, tool, conv_id,
                     lead(epoch) OVER (PARTITION BY conv_id
                                       ORDER BY turn_idx) - epoch AS gap
              FROM tr
            )
            SELECT tool,
                   cast(count(*) AS bigint) AS n_calls,
                   cast(count(DISTINCT conv_id) AS bigint) AS n_convs,
                   cast(count(gap) AS bigint) AS n_gaps,
                   CASE WHEN count(gap) > 0
                        THEN round(sum(gap) / count(gap), 6) END
                     AS mean_next_gap_s,
                   cast(max(gap) AS bigint) AS max_next_gap_s
            FROM t WHERE role = 'tool' AND tool IS NOT NULL
            GROUP BY tool
        """,
        # Composed transcript curation over the planted corpus: each
        # stage's CTE is the already-oracled operator chain, the CASE
        # is the fixed rejection precedence (see q_curate_transcripts
        # / _curate_transcripts_corpus).
        "curate_transcripts": f"""
            WITH tr AS ({_SYNTH_TRANSCRIPTS_SQL}),
            base AS (
              SELECT conv_id, turn_idx, role,
                     CASE WHEN cast(conv_id AS bigint) % 19 = 0
                               AND turn_idx = 2 THEN ''
                          WHEN cast(conv_id AS bigint) % 11 = 0
                               AND turn_idx BETWEEN 3 AND 5
                          THEN 'retrying tool call'
                          ELSE text END AS text
              FROM tr
            ),
            corpus AS (
              SELECT conv_id, turn_idx, role, text FROM base
              UNION ALL
              SELECT conv_id || '_dup', turn_idx, role, text
              FROM base WHERE cast(conv_id AS bigint) % 13 = 0
            ),
            struct_ AS (
              SELECT conv_id,
                     cast(count(*) AS bigint) AS n_turns,
                     cast(sum(coalesce(length(text), 0)) AS bigint)
                       AS total_chars,
                     (min(turn_idx) = 1 AND max(turn_idx) = count(*)
                      AND count(DISTINCT turn_idx) = count(*)
                      AND count(*) FILTER (WHERE text IS NULL
                                             OR length(text) = 0) = 0)
                       AS ok
              FROM corpus GROUP BY conv_id
            ),
            brk AS (
              SELECT conv_id, turn_idx,
                     CASE WHEN row_number() OVER w > 1
                               AND lag(text) OVER w
                                   IS NOT DISTINCT FROM text
                          THEN 0 ELSE 1 END AS brk
              FROM corpus
              WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
            ),
            runs AS (
              SELECT conv_id, turn_idx,
                     sum(brk) OVER (PARTITION BY conv_id
                                    ORDER BY turn_idx) AS run
              FROM brk
            ),
            lp AS (
              SELECT conv_id, max(pos) >= 3 AS is_looping FROM (
                SELECT conv_id,
                       row_number() OVER (PARTITION BY conv_id, run
                                          ORDER BY turn_idx) AS pos
                FROM runs
              ) GROUP BY conv_id
            ),
            reaching AS (
              SELECT s.conv_id FROM struct_ s JOIN lp USING (conv_id)
              WHERE s.ok AND NOT lp.is_looping
            ),
            fp AS (
              SELECT conv_id,
                     md5(string_agg(coalesce(role, '') || chr(31)
                                    || coalesce(text, ''),
                                    chr(30) ORDER BY turn_idx))
                       AS fingerprint
              FROM corpus
              WHERE conv_id IN (SELECT conv_id FROM reaching)
              GROUP BY conv_id
            ),
            canon AS (
              SELECT fingerprint, min(conv_id) AS canonical_conv_id
              FROM fp GROUP BY 1
            ),
            dd AS (
              SELECT conv_id, conv_id <> canonical_conv_id AS is_dup
              FROM fp JOIN canon USING (fingerprint)
            )
            SELECT conv_id, n_turns, total_chars, reason,
                   reason IS NULL AS accepted
            FROM (
              SELECT s.conv_id, s.n_turns, s.total_chars,
                     CASE WHEN NOT s.ok THEN 'invalid'
                          WHEN lp.is_looping THEN 'looping'
                          WHEN dd.is_dup THEN 'exact_dup'
                          WHEN s.total_chars > 200 THEN 'over_budget'
                          END AS reason
              FROM struct_ s
              JOIN lp USING (conv_id)
              LEFT JOIN dd USING (conv_id)
            )
        """,
        # Incremental transcript curation replayed in SQL: both
        # batches' verdict pipelines share the per-(batch, conv_id)
        # stage CTEs; batch 2's known-fingerprint set is exactly what
        # the increment persists — batch 1's dedup-REACHING distinct
        # fingerprints (over_budget included, invalid/looping not; see
        # curate_transcripts_increment docstring) — and within-batch
        # dedup is the min-conv_id canonical (see
        # q_curate_transcripts_increment).
        "curate_transcripts_increment": f"""
            WITH tr AS ({_SYNTH_TRANSCRIPTS_SQL}),
            b1 AS (
              SELECT conv_id, turn_idx, role,
                     CASE WHEN cast(conv_id AS bigint) % 19 = 0
                               AND turn_idx = 2 THEN ''
                          WHEN cast(conv_id AS bigint) % 11 = 0
                               AND turn_idx BETWEEN 3 AND 5
                          THEN 'retrying tool call'
                          ELSE text END AS text
              FROM tr
            ),
            corpus AS (
              SELECT cast(1 AS int) AS batch, conv_id, turn_idx, role,
                     text
              FROM b1
              UNION ALL
              SELECT 2, 'z' || conv_id || 'r', turn_idx, role, text
              FROM b1 WHERE cast(conv_id AS bigint) % 13 = 0
              UNION ALL
              SELECT 2, 'z' || conv_id || 'r2', turn_idx, role, text
              FROM b1 WHERE cast(conv_id AS bigint) % 26 = 0
              UNION ALL
              SELECT 2, f.conv_id, cast(t.i AS int),
                     CASE WHEN t.i = 1 THEN 'user'
                          ELSE 'assistant' END,
                     'fresh ' || f.conv_id || ' '
                       || cast(t.i AS varchar)
              FROM (SELECT DISTINCT 'z' || conv_id || 'f' AS conv_id
                    FROM b1 WHERE cast(conv_id AS bigint) % 7 = 0) f,
                   UNNEST([1, 2]) AS t(i)
            ),
            struct_ AS (
              SELECT batch, conv_id,
                     cast(sum(coalesce(length(text), 0)) AS bigint)
                       AS total_chars,
                     (min(turn_idx) = 1 AND max(turn_idx) = count(*)
                      AND count(DISTINCT turn_idx) = count(*)
                      AND count(*) FILTER (WHERE text IS NULL
                                             OR length(text) = 0) = 0)
                       AS ok
              FROM corpus GROUP BY batch, conv_id
            ),
            brk AS (
              SELECT batch, conv_id, turn_idx,
                     CASE WHEN row_number() OVER w > 1
                               AND lag(text) OVER w
                                   IS NOT DISTINCT FROM text
                          THEN 0 ELSE 1 END AS brk
              FROM corpus
              WINDOW w AS (PARTITION BY batch, conv_id ORDER BY turn_idx)
            ),
            runs AS (
              SELECT batch, conv_id, turn_idx,
                     sum(brk) OVER (PARTITION BY batch, conv_id
                                    ORDER BY turn_idx) AS run
              FROM brk
            ),
            lp AS (
              SELECT batch, conv_id, max(pos) >= 3 AS is_looping FROM (
                SELECT batch, conv_id,
                       row_number() OVER (PARTITION BY batch, conv_id,
                                          run ORDER BY turn_idx) AS pos
                FROM runs
              ) GROUP BY batch, conv_id
            ),
            reaching AS (
              SELECT s.batch, s.conv_id
              FROM struct_ s JOIN lp USING (batch, conv_id)
              WHERE s.ok AND NOT lp.is_looping
            ),
            fp AS (
              SELECT c.batch, c.conv_id,
                     md5(string_agg(coalesce(c.role, '') || chr(31)
                                    || coalesce(c.text, ''),
                                    chr(30) ORDER BY c.turn_idx))
                       AS fingerprint
              FROM corpus c JOIN reaching USING (batch, conv_id)
              GROUP BY c.batch, c.conv_id
            ),
            known AS (
              SELECT DISTINCT fingerprint FROM fp WHERE batch = 1
            ),
            canon AS (
              SELECT batch, fingerprint, min(conv_id) AS canon
              FROM fp GROUP BY 1, 2
            ),
            dd AS (
              SELECT f.batch, f.conv_id,
                     (f.conv_id <> c.canon
                      OR (f.batch = 2 AND f.fingerprint IN
                            (SELECT fingerprint FROM known)))
                       AS is_dup
              FROM fp f JOIN canon c USING (batch, fingerprint)
            )
            SELECT batch, conv_id,
                   coalesce(reason, 'accepted') AS status
            FROM (
              SELECT s.batch, s.conv_id,
                     CASE WHEN NOT s.ok THEN 'invalid'
                          WHEN lp.is_looping THEN 'looping'
                          WHEN dd.is_dup THEN 'exact_dup'
                          WHEN s.total_chars > 200 THEN 'over_budget'
                          END AS reason
              FROM struct_ s
              JOIN lp USING (batch, conv_id)
              LEFT JOIN dd USING (batch, conv_id)
            )
        """,
        # MMR diversity re-ranking: pool CTE (exact cosine top-50) +
        # four unrolled greedy argmax steps; every score is
        # 0.3·cos − (1.0 − 0.3)·max-cos-to-selected with the SAME
        # literals the operator computes, and every cosine on the
        # Pythagorean corpus is one correctly-rounded division of
        # exact integers (see q_similarity_mmr / _mmr_vectors).
        "similarity_mmr": """
            WITH v AS (
              SELECT o_orderkey AS vec_id,
                     [cast(o_orderkey % 3 + 1 AS double)
                        * (CASE o_orderkey % 4 WHEN 0 THEN 1.0
                                WHEN 1 THEN 4.0 WHEN 2 THEN 3.0
                                ELSE 0.0 END),
                      cast(o_orderkey % 3 + 1 AS double)
                        * (CASE o_orderkey % 4 WHEN 0 THEN 0.0
                                WHEN 1 THEN 3.0 WHEN 2 THEN 4.0
                                ELSE 1.0 END),
                      0.0, 0.0, 0.0, 0.0, 0.0, 0.0] AS emb
              FROM orders WHERE o_orderkey % 199 = 0
            ),
            pool AS (
              SELECT vec_id, emb,
                     list_cosine_similarity(emb,
                       [1.0,0.0,0.0,0.0,0.0,0.0,0.0,0.0]) AS cos
              FROM v
              ORDER BY cos DESC, vec_id LIMIT 50
            ),
            s1 AS (SELECT vec_id, cos, 0.3 * cos AS score FROM pool
                   ORDER BY 0.3 * cos DESC, vec_id LIMIT 1),
            m2 AS (
              SELECT p.vec_id, p.cos,
                     0.3 * p.cos - (1.0 - 0.3)
                       * max(list_cosine_similarity(p.emb, s.emb))
                       AS score
              FROM pool p, pool s
              WHERE s.vec_id IN (SELECT vec_id FROM s1)
                AND p.vec_id NOT IN (SELECT vec_id FROM s1)
              GROUP BY p.vec_id, p.cos
            ),
            s2 AS (SELECT vec_id, cos, score FROM m2
                   ORDER BY score DESC, vec_id LIMIT 1),
            m3 AS (
              SELECT p.vec_id, p.cos,
                     0.3 * p.cos - (1.0 - 0.3)
                       * max(list_cosine_similarity(p.emb, s.emb))
                       AS score
              FROM pool p, pool s
              WHERE s.vec_id IN (SELECT vec_id FROM s1
                                 UNION ALL SELECT vec_id FROM s2)
                AND p.vec_id NOT IN (SELECT vec_id FROM s1
                                     UNION ALL SELECT vec_id FROM s2)
              GROUP BY p.vec_id, p.cos
            ),
            s3 AS (SELECT vec_id, cos, score FROM m3
                   ORDER BY score DESC, vec_id LIMIT 1),
            m4 AS (
              SELECT p.vec_id, p.cos,
                     0.3 * p.cos - (1.0 - 0.3)
                       * max(list_cosine_similarity(p.emb, s.emb))
                       AS score
              FROM pool p, pool s
              WHERE s.vec_id IN (SELECT vec_id FROM s1
                                 UNION ALL SELECT vec_id FROM s2
                                 UNION ALL SELECT vec_id FROM s3)
                AND p.vec_id NOT IN (SELECT vec_id FROM s1
                                     UNION ALL SELECT vec_id FROM s2
                                     UNION ALL SELECT vec_id FROM s3)
              GROUP BY p.vec_id, p.cos
            ),
            s4 AS (SELECT vec_id, cos, score FROM m4
                   ORDER BY score DESC, vec_id LIMIT 1)
            SELECT cast(1 AS int) AS rank, vec_id,
                   round(cos, 6) AS cosine, round(score, 6) AS mmr_score
            FROM s1
            UNION ALL SELECT 2, vec_id, round(cos, 6), round(score, 6)
            FROM s2
            UNION ALL SELECT 3, vec_id, round(cos, 6), round(score, 6)
            FROM s3
            UNION ALL SELECT 4, vec_id, round(cos, 6), round(score, 6)
            FROM s4
        """,
        # Per-source tokenizer fertility: exact bigint sums of chars and
        # BPE-regex tokens, two round-6 divisions (see
        # q_corpus_fertility).
        "corpus_fertility": rf"""
            SELECT source AS "group",
                   cast(count(*) AS bigint) AS n_docs,
                   cast(sum(coalesce(length(text), 0)) AS bigint)
                     AS total_chars,
                   cast(sum(len(regexp_extract_all(
                     text, '{BPE_TOKEN_REGEX}'))) AS bigint)
                     AS total_tokens,
                   CASE WHEN sum(len(regexp_extract_all(
                              text, '{BPE_TOKEN_REGEX}'))) > 0
                        THEN round(sum(coalesce(length(text), 0))
                                   / sum(len(regexp_extract_all(
                                       text, '{BPE_TOKEN_REGEX}'))), 6)
                   END AS chars_per_token,
                   CASE WHEN count(*) > 0
                        THEN round(sum(len(regexp_extract_all(
                               text, '{BPE_TOKEN_REGEX}')))
                             / count(*), 6)
                   END AS tokens_per_doc
            FROM documents GROUP BY source
        """,
        # Exact-dup family-size histogram over the replay-planted
        # corpus: md5 content classes → family sizes → histogram,
        # integer-only (see q_dedup_family_sizes).
        "dedup_family_sizes": """
            WITH corpus AS (
              SELECT text FROM documents
              UNION ALL SELECT text FROM documents WHERE doc_id % 7 = 0
              UNION ALL SELECT text FROM documents WHERE doc_id % 7 = 0
              UNION ALL SELECT text FROM documents WHERE doc_id % 13 = 0
            ),
            fam AS (
              SELECT md5(coalesce(text, '')) AS h,
                     cast(count(*) AS bigint) AS family_size
              FROM corpus GROUP BY 1
            )
            SELECT family_size,
                   cast(count(*) AS bigint) AS n_families,
                   cast(family_size * count(*) AS bigint) AS n_docs
            FROM fam GROUP BY family_size
        """,
        # C4-style line dedup over the planted boilerplate corpus:
        # window count + first-occurrence rank over the identical line
        # stream (Spark groups by md5(line) — same equality classes),
        # string_agg rejoin in line order (see q_line_dedup).
        "line_dedup": """
            WITH d AS (
              SELECT doc_id,
                     concat_ws(chr(10),
                       CASE WHEN doc_id % 3 = 0
                            THEN '=== boilerplate header ===' END,
                       text,
                       CASE WHEN doc_id % 5 = 0 THEN text END,
                       CASE WHEN doc_id % 4 = 0
                            THEN '-- generated footer --' END) AS text
              FROM documents
            ),
            lines AS (
              SELECT doc_id, i - 1 AS line_idx, parts[i] AS line
              FROM (SELECT doc_id,
                           string_split(coalesce(text, ''), chr(10))
                             AS parts
                    FROM d),
                   UNNEST(generate_series(1, len(parts))) AS t(i)
            ),
            flagged AS (
              SELECT doc_id, line_idx, line,
                     count(*) OVER (PARTITION BY line) AS cnt,
                     row_number() OVER (PARTITION BY line
                                        ORDER BY doc_id, line_idx) AS rn
              FROM lines
            )
            SELECT d.doc_id,
                   coalesce(k.text, '') AS text,
                   f.n_lines, f.n_removed
            FROM d
            JOIN (SELECT doc_id,
                         cast(count(*) AS bigint) AS n_lines,
                         cast(count(*) FILTER (WHERE cnt >= 2 AND rn > 1)
                              AS bigint) AS n_removed
                  FROM flagged GROUP BY doc_id) f USING (doc_id)
            LEFT JOIN (SELECT doc_id,
                              string_agg(line, chr(10)
                                         ORDER BY line_idx) AS text
                       FROM flagged
                       WHERE cnt < 2 OR rn = 1
                       GROUP BY doc_id) k USING (doc_id)
        """,
        # Terminal-state triage over the failure-planted transcripts:
        # the loop CTE is transcript_loops' (min_run=3), last-turn and
        # last-tool-turn signals via arg_max, fixed precedence CASE
        # (see q_transcript_outcomes).
        "transcript_outcomes": f"""
            WITH tr AS ({_SYNTH_TRANSCRIPTS_SQL}),
            c AS (
              SELECT conv_id, turn_idx, role,
                     CASE WHEN cast(conv_id AS bigint) % 11 = 0
                               AND turn_idx BETWEEN 3 AND 5
                          THEN 'retrying tool call'
                          WHEN cast(conv_id AS bigint) % 7 = 0
                               AND role = 'tool'
                          THEN 'Traceback: tool exploded'
                          ELSE text END AS text
              FROM tr
            ),
            f AS (
              SELECT conv_id, turn_idx,
                     CASE WHEN row_number() OVER w > 1
                               AND lag(text) OVER w
                                   IS NOT DISTINCT FROM text
                          THEN 0 ELSE 1 END AS brk
              FROM c
              WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
            ),
            runs AS (
              SELECT conv_id, turn_idx,
                     sum(brk) OVER (PARTITION BY conv_id
                                    ORDER BY turn_idx) AS run
              FROM f
            ),
            lp AS (
              SELECT conv_id, max(pos) >= 3 AS is_looping FROM (
                SELECT conv_id,
                       row_number() OVER (PARTITION BY conv_id, run
                                          ORDER BY turn_idx) AS pos
                FROM runs
              ) GROUP BY conv_id
            ),
            last AS (
              SELECT conv_id, cast(count(*) AS bigint) AS n_turns,
                     arg_max(role, turn_idx) AS last_role
              FROM c GROUP BY conv_id
            ),
            te AS (
              SELECT conv_id,
                     coalesce(regexp_matches(
                       arg_max(text, turn_idx),
                       'error|exception|traceback|failed', 'i'),
                       FALSE) AS terr
              FROM c WHERE role = 'tool' GROUP BY conv_id
            )
            SELECT conv_id, n_turns, last_role,
                   CASE WHEN lp.is_looping THEN 'looping'
                        WHEN coalesce(te.terr, FALSE) THEN 'tool_failure'
                        WHEN last_role = 'user' THEN 'abandoned'
                        ELSE 'completed' END AS outcome
            FROM last
            JOIN lp USING (conv_id)
            LEFT JOIN te USING (conv_id)
        """,
        # DPO preference pairs over the shared-prompt preference
        # corpus: sft adjacency pairs + transcript_outcomes CTE chain,
        # per-prompt rank windows (length DESC for chosen, severity
        # ASC for rejected, identical tie-breaks), inner join keeps
        # prompts with both sides (see q_dpo_pairs).
        "dpo_pairs": f"""
            {_PREF_PAIRS_OUTCOMES_SQL},
            ch AS (
              SELECT prompt, response AS chosen,
                     conv_id AS chosen_conv_id,
                     prompt_turn_idx AS chosen_turn_idx,
                     row_number() OVER (
                       PARTITION BY prompt
                       ORDER BY length(response) DESC,
                                conv_id ASC, prompt_turn_idx ASC
                     ) AS rn,
                     cast(count(*) OVER (PARTITION BY prompt) AS bigint)
                       AS n_chosen
              FROM lab WHERE outcome = 'completed'
            ),
            rj AS (
              SELECT prompt, response AS rejected,
                     conv_id AS rejected_conv_id,
                     prompt_turn_idx AS rejected_turn_idx,
                     outcome AS rejected_outcome,
                     row_number() OVER (
                       PARTITION BY prompt
                       ORDER BY CASE outcome
                                  WHEN 'looping' THEN 0
                                  WHEN 'tool_failure' THEN 1
                                  ELSE 2 END ASC,
                                conv_id ASC, prompt_turn_idx ASC
                     ) AS rn,
                     cast(count(*) OVER (PARTITION BY prompt) AS bigint)
                       AS n_rejected
              FROM lab WHERE outcome <> 'completed'
            )
            SELECT prompt, chosen, rejected, chosen_conv_id,
                   chosen_turn_idx, rejected_conv_id, rejected_turn_idx,
                   rejected_outcome, n_chosen, n_rejected
            FROM ch JOIN rj USING (prompt)
            WHERE ch.rn = 1 AND rj.rn = 1
        """,
        # Best-of-n rejection sampling over the same corpus's SFT
        # pairs, scored by response length: per-prompt rank window
        # (score DESC, conv/turn ASC), rn=1 winner + group size
        # (see q_best_of_n_pairs).
        "best_of_n_pairs": f"""
            {_PREF_PAIRS_OUTCOMES_SQL},
            ranked AS (
              SELECT prompt, response,
                     cast(length(response) AS int) AS n_response_chars,
                     conv_id, prompt_turn_idx,
                     row_number() OVER (
                       PARTITION BY prompt
                       ORDER BY length(response) DESC,
                                conv_id ASC, prompt_turn_idx ASC
                     ) AS rn,
                     cast(count(*) OVER (PARTITION BY prompt) AS bigint)
                       AS n_candidates
              FROM pairs
            )
            SELECT prompt, response, n_response_chars, conv_id,
                   prompt_turn_idx, n_candidates
            FROM ranked WHERE rn = 1
        """,
        # Newman degree assortativity over the 3-clique+pendant gadget
        # union: exact bigint sums over edge-endpoint degrees, the
        # 4M²-scaled integer numerator/denominator, ONE round-6
        # division (see q_graph_assortativity).
        "graph_assortativity": """
            WITH ks AS (SELECT o_orderkey AS k FROM orders
                        WHERE o_orderkey % 13 = 0),
            e0 AS (
              SELECT 3 * k AS s, 3 * k + 1 AS d FROM ks
              UNION ALL SELECT 3 * k + 1, 3 * k + 2 FROM ks
              UNION ALL SELECT 3 * k, 3 * k + 2 FROM ks
              UNION ALL SELECT 3 * k + 2, 3 * k + 3 FROM ks
            ),
            e AS (SELECT DISTINCT least(s, d) AS a, greatest(s, d) AS b
                  FROM e0 WHERE s <> d),
            deg AS (
              SELECT id, count(*) AS dg FROM (
                SELECT a AS id FROM e UNION ALL SELECT b FROM e
              ) GROUP BY id
            ),
            s AS (
              SELECT cast(count(*) AS bigint) AS m,
                     cast(sum(da.dg * db.dg) AS bigint) AS s1,
                     cast(sum(da.dg + db.dg) AS bigint) AS s2,
                     cast(sum(da.dg * da.dg + db.dg * db.dg) AS bigint)
                       AS s3
              FROM e
              JOIN deg da ON e.a = da.id
              JOIN deg db ON e.b = db.id
            )
            SELECT (SELECT cast(count(*) AS bigint) FROM deg) AS n_nodes,
                   m AS n_edges,
                   CASE WHEN m > 0 AND 2 * m * s3 - s2 * s2 <> 0
                        THEN round((4 * m * s1 - s2 * s2)
                                   / (2 * m * s3 - s2 * s2), 6) END
                     AS assortativity
            FROM s
        """,
        # Stuck-agent detection over the loop-planted corpus: NULL-safe
        # lag-flag run ids, run lengths, min_run=3 (see
        # q_transcript_loops / _triage_loop_corpus).
        "transcript_loops": f"""
            WITH tr AS ({_SYNTH_TRANSCRIPTS_SQL}),
            c AS (
              SELECT conv_id, turn_idx,
                     CASE WHEN cast(conv_id AS bigint) % 11 = 0
                               AND turn_idx BETWEEN 3 AND 5
                          THEN 'retrying tool call'
                          WHEN cast(conv_id AS bigint) % 23 = 0
                               AND turn_idx BETWEEN 2 AND 3
                          THEN 'echo'
                          ELSE text END AS text
              FROM tr
            ),
            f AS (
              SELECT conv_id, turn_idx,
                     CASE WHEN row_number() OVER w > 1
                               AND lag(text) OVER w
                                   IS NOT DISTINCT FROM text
                          THEN 0 ELSE 1 END AS brk
              FROM c
              WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
            ),
            r AS (
              SELECT conv_id, brk,
                     sum(brk) OVER (PARTITION BY conv_id
                                    ORDER BY turn_idx) AS run
              FROM f
            ),
            runs AS (
              SELECT conv_id, run, count(*) AS len
              FROM r GROUP BY conv_id, run
            ),
            per_turn AS (
              SELECT conv_id,
                     cast(count(*) AS bigint) AS n_turns,
                     cast(sum(1 - brk) AS bigint) AS n_stuttered_turns
              FROM r GROUP BY conv_id
            ),
            per_conv AS (
              SELECT conv_id, cast(max(len) AS bigint) AS max_stutter_run
              FROM runs GROUP BY conv_id
            )
            SELECT t.conv_id, n_turns, max_stutter_run, n_stuttered_turns,
                   max_stutter_run >= 3 AS is_looping
            FROM per_turn t JOIN per_conv p USING (conv_id)
        """,
        # Context-budget profile at 150 chars: inclusive running char
        # sums, first-over turn, round-6 over-budget share (see
        # q_transcript_context_growth).
        "transcript_context_growth": f"""
            WITH tr AS ({_SYNTH_TRANSCRIPTS_SQL}),
            c AS (
              SELECT conv_id, turn_idx,
                     coalesce(length(text), 0) AS chars,
                     sum(coalesce(length(text), 0))
                       OVER (PARTITION BY conv_id ORDER BY turn_idx)
                       AS cum
              FROM tr
            )
            SELECT conv_id,
                   cast(count(*) AS bigint) AS n_turns,
                   cast(sum(chars) AS bigint) AS total_chars,
                   min(CASE WHEN cum > 150 THEN turn_idx END)
                     AS first_over_idx,
                   cast(count(*) FILTER (WHERE cum > 150) AS bigint)
                     AS n_turns_over,
                   round(count(*) FILTER (WHERE cum > 150)
                         / count(*), 6) AS frac_over
            FROM c GROUP BY conv_id
        """,
        # Per-tool failure profile over the error-planted corpus:
        # case-insensitive regex, round-6 rate, conversation blast
        # radius (see q_transcript_tool_errors / _triage_error_corpus).
        "transcript_tool_errors": f"""
            WITH tr AS ({_SYNTH_TRANSCRIPTS_SQL}),
            c AS (
              SELECT conv_id, role, tool,
                     text || CASE WHEN role = 'tool'
                                   AND (cast(conv_id AS bigint) + turn_idx)
                                       % 5 = 0
                                  THEN ' ERROR: tool failed'
                                  ELSE '' END AS text
              FROM tr
            ),
            calls AS (
              SELECT tool, conv_id,
                     coalesce(regexp_matches(
                       text, 'error|exception|traceback|failed', 'i'),
                       FALSE) AS err
              FROM c WHERE role = 'tool' AND tool IS NOT NULL
            )
            SELECT tool,
                   cast(count(*) AS bigint) AS n_calls,
                   cast(count(*) FILTER (WHERE err) AS bigint) AS n_errors,
                   round(count(*) FILTER (WHERE err) / count(*), 6)
                     AS error_rate,
                   cast(count(DISTINCT conv_id) AS bigint) AS n_convs,
                   cast(count(DISTINCT CASE WHEN err THEN conv_id END)
                        AS bigint) AS n_convs_with_error
            FROM calls GROUP BY tool
        """,
        # Tool-workflow bigrams: lag over the tool-turn subset only
        # (WHERE applies before the window in both engines), transition
        # counts + conversation reach (see q_transcript_tool_chains).
        "transcript_tool_chains": f"""
            WITH tr AS ({_SYNTH_TRANSCRIPTS_SQL}),
            calls AS (
              SELECT conv_id, tool AS to_tool,
                     lag(tool) OVER (PARTITION BY conv_id
                                     ORDER BY turn_idx) AS from_tool
              FROM tr WHERE role = 'tool' AND tool IS NOT NULL
            )
            SELECT from_tool, to_tool,
                   cast(count(*) AS bigint) AS n,
                   cast(count(DISTINCT conv_id) AS bigint) AS n_convs
            FROM calls WHERE from_tool IS NOT NULL
            GROUP BY from_tool, to_tool
        """,
        "transcript_role_transitions": f"""
            WITH tr AS ({_SYNTH_TRANSCRIPTS_SQL}),
            t AS (
              SELECT lag(role) OVER (PARTITION BY conv_id
                                     ORDER BY turn_idx) AS from_role,
                     role AS to_role
              FROM tr
            )
            SELECT from_role, to_role, count(*) AS n
            FROM t WHERE from_role IS NOT NULL
            GROUP BY from_role, to_role
        """,
        "embedding_decontaminate": """
            WITH probes AS (
              SELECT vec_id AS eid, cast(embedding AS double[]) AS ev
              FROM embeddings
              WHERE vec_id % 83 = 0 AND embedding IS NOT NULL
                AND list_dot_product(cast(embedding AS double[]),
                                     cast(embedding AS double[])) > 0
            ),
            base AS (
              SELECT vec_id, cast(embedding AS double[]) AS cv,
                     (embedding IS NOT NULL AND
                      list_dot_product(cast(embedding AS double[]),
                                       cast(embedding AS double[])) > 0)
                       AS scorable
              FROM embeddings
            ),
            scored AS (
              SELECT vec_id, eid,
                     round(list_cosine_similarity(cv, ev), 3) AS cos
              FROM base, probes WHERE scorable
            ),
            nearest AS (
              SELECT vec_id, eid, cos FROM (
                SELECT vec_id, eid, cos,
                       row_number() OVER (PARTITION BY vec_id
                                          ORDER BY cos DESC, eid ASC) AS rn
                FROM scored
              ) WHERE rn = 1
            )
            SELECT b.vec_id, n.eid AS eval_id, n.cos AS cosine,
                   coalesce(n.cos >= 0.99, FALSE) AS contaminated
            FROM base b LEFT JOIN nearest n USING (vec_id)
        """,
        "cypher_var_length": """
            WITH k AS (
              SELECT CAST(o_orderkey AS VARCHAR) AS k
              FROM orders WHERE o_orderkey % 31 = 0
            )
            -- relationship-unique paths of length 1..2 from m{k}:
            -- len 1 → da{k}, db{k}; len 2 → ip{k} (m→da→ip); db has no
            -- outgoing edge and no 2-path reuses an edge, so the
            -- planted enumeration is exact
            SELECT 'mal' || k AS mal, 'da' || k AS target FROM k
            UNION ALL
            SELECT 'mal' || k, 'db' || k FROM k
            UNION ALL
            SELECT 'mal' || k, 'ip' || k FROM k
        """,
        "cypher_optional_match": """
            WITH k AS (
              SELECT CAST(o_orderkey AS VARCHAR) AS k
              FROM orders WHERE o_orderkey % 31 = 0
            )
            SELECT 'a' || k || '.evil.net' AS domain, 'ip' || k AS ip FROM k
            UNION ALL
            SELECT 'b' || k || '.evil.net' AS domain,
                   CAST(NULL AS VARCHAR) AS ip
            FROM k
        """,
        "span_dup_stats": _SPAN_PG_SQL + """,
            covx AS (
              SELECT doc_id, unnest(generate_series(pos, pos + 5)) AS tp
              FROM dup
            ),
            cov AS (
              SELECT doc_id, count(DISTINCT tp) AS dup_tokens
              FROM covx GROUP BY doc_id
            ),
            nd AS (SELECT doc_id, count(*) AS n_dup_grams FROM dup GROUP BY doc_id)
            SELECT b2.doc_id, n_tokens,
                   greatest(n_tokens - 5, 0) AS n_grams,
                   coalesce(nd.n_dup_grams, 0) AS n_dup_grams,
                   coalesce(cov.dup_tokens, 0) AS dup_tokens,
                   round(cast(coalesce(cov.dup_tokens, 0) AS double) / n_tokens,
                         6) AS dup_ratio
            FROM b2 LEFT JOIN nd USING (doc_id) LEFT JOIN cov USING (doc_id)
        """,
        "span_scrub": _SPAN_PG_SQL + """,
            covl AS (
              SELECT doc_id, list(DISTINCT tp) AS cov
              FROM (SELECT doc_id, unnest(generate_series(pos, pos + 5)) AS tp
                    FROM dup)
              GROUP BY doc_id
            )
            SELECT b.doc_id,
                   -- array_to_string of an EMPTY list is NULL in DuckDB
                   -- (Spark array_join gives ''): coalesce to match.
                   coalesce(array_to_string(
                     [b.t[i] FOR i IN generate_series(1, cast(len(b.t) AS int))
                      IF NOT list_contains(
                           coalesce(covl.cov, CAST([] AS BIGINT[])), i)],
                     ' '), '') AS clean_text
            FROM base b LEFT JOIN covl USING (doc_id)
        """,
        "asof_join_events_orders": """
            WITH cand AS (
              SELECT e.event_id, o.o_orderkey, o.o_totalprice,
                     row_number() OVER (
                       PARTITION BY e.event_id
                       ORDER BY o.o_orderdate DESC, o.o_orderkey DESC
                     ) AS rn
              FROM events e
              JOIN orders o
                ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
            )
            SELECT e.event_id, e.user_id, e.ts,
                   c.o_orderkey AS asof_orderkey,
                   round(c.o_totalprice, 4) AS asof_totalprice
            FROM events e
            LEFT JOIN cand c ON c.event_id = e.event_id AND c.rn = 1
        """,
        "interval_join_events": """
            WITH wins AS (
              SELECT o_orderkey AS window_id,
                     TIMESTAMP '2024-01-01 00:00:00'
                       + (o_orderkey % 28) * INTERVAL 1 DAY
                       + (o_orderkey % 24) * INTERVAL 1 HOUR AS ws
              FROM orders WHERE o_orderkey % 40 = 0
            )
            SELECT w.window_id,
                   count(*) AS n_events,
                   round(sum(e.value), 2) AS sum_value,
                   min(e.event_id) AS first_event,
                   max(e.event_id) AS last_event
            FROM wins w
            JOIN events e
              ON e.ts >= w.ws AND e.ts < w.ws + INTERVAL 2 DAY
            GROUP BY w.window_id
        """,
        "html_to_text": _html_to_text_oracle_sql(),
        "multimodal_decode": """
            SELECT o_orderkey AS asset_id,
                   (['image','audio','video'])[cast(o_orderkey % 3 AS int) + 1] AS kind,
                   cast(8 + o_orderkey % 56 AS int) AS width,
                   cast(8 + (o_orderkey * 7) % 56 AS int) AS height,
                   cast(CASE WHEN o_orderkey % 3 = 2 THEN 1 + o_orderkey % 29
                             ELSE 1 END AS int) AS n_frames
            FROM orders
        """,
        "pack_documents": r"""
            WITH t AS (
              SELECT doc_id,
                     cast(len(regexp_split_to_array(trim(lower(text)), '\s+')) AS bigint) AS n_tokens,
                     cast(doc_id % 4 AS bigint) AS shard
              FROM documents
            )
            SELECT shard, doc_id, n_tokens,
                   cast(floor(coalesce(sum(n_tokens) OVER (
                     PARTITION BY shard
                     ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) / 500) AS bigint) AS pack_id
            FROM t
        """,
        "train_val_split": """
            SELECT doc_id,
                   CASE WHEN md5_number_upper('split:' || cast(doc_id AS varchar))
                             % 1000000 < 900000
                        THEN 'train' ELSE 'val' END AS split
            FROM documents
        """,
        "skew_hot_entities": f"""
            WITH triples AS ({_CONSTRUCTED_TRIPLES_SQL}),
            m AS (
              SELECT subj AS entity FROM triples
              UNION ALL
              SELECT obj AS entity FROM triples
            )
            SELECT entity, count(*) AS count FROM m GROUP BY entity
        """,
        "dedup_exact_docs": """
            SELECT md5(text) AS content_hash, count(*) AS n_copies,
                   min(doc_id) AS keep_id
            FROM documents GROUP BY md5(text)
        """,
        "text_token_counts": rf"""
            SELECT doc_id,
                   cast(len(regexp_split_to_array(trim(lower(text)), '\s+')) AS int) AS ws_tokens,
                   cast(len(regexp_extract_all(text, '{BPE_TOKEN_REGEX}')) AS int) AS bpe_tokens
            FROM documents
        """,
        # tfidf: score rounded to 6 BEFORE ranking; rank key is
        # (tfidf DESC, df ASC, term ASC) — fully deterministic, so both
        # engines pick identical rows even among (tf, df) ties (see
        # operators/text_quality.py::tfidf_top_terms).
        "text_tfidf_top_terms": """
            WITH toks AS (
              SELECT doc_id,
                     unnest(regexp_extract_all(lower(text), '[a-z0-9]{2,}')) AS term
              FROM documents
            ),
            tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
            dfr AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
            n AS (SELECT count(*) AS n FROM documents),
            scored AS (
              SELECT tf.doc_id, tf.term, tf.tf, dfr.df,
                     round(tf.tf * ln((n.n + 1.0) / (dfr.df + 1.0)), 6) AS tfidf
              FROM tf JOIN dfr USING (term) CROSS JOIN n
            )
            SELECT doc_id, term, tf, df, tfidf, cast(rk AS int) AS rk FROM (
              SELECT *, row_number() OVER (
                PARTITION BY doc_id
                ORDER BY tfidf DESC, df ASC, term ASC
              ) AS rk
              FROM scored
            ) WHERE rk <= 5
        """,
        "text_quality_score": rf"""
            WITH m AS (
              SELECT doc_id,
                     length(text) AS n_chars,
                     len(regexp_split_to_array(trim(lower(text)), '\s+')) AS n_tokens,
                     length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS n_punct,
                     length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')) AS n_upper,
                     len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                         x -> list_contains([{en}], x))) AS hits
              FROM documents
            )
            SELECT doc_id,
                   round(
                     least(n_tokens / 64.0, 1.0) * 0.3
                     + least((hits * 1.0 / n_tokens) * 4.0, 1.0) * 0.4
                     + (1.0 - least((n_punct * 1.0 / n_chars) * 10.0, 1.0)) * 0.2
                     + (1.0 - least((n_upper * 1.0 / n_chars) * 5.0, 1.0)) * 0.1,
                   6) AS quality
            FROM m
        """,
        "text_language_id": rf"""
            WITH h AS (
              SELECT doc_id,
                     len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                         x -> list_contains([{en}], x))) AS hits_en,
                     len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                         x -> list_contains([{es}], x))) AS hits_es,
                     len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                         x -> list_contains([{de}], x))) AS hits_de
              FROM documents
            )
            SELECT doc_id,
                   CASE WHEN hits_es > hits_en AND hits_es >= hits_de THEN 'es'
                        WHEN hits_de > hits_en AND hits_de > hits_es THEN 'de'
                        ELSE 'en' END AS lang_pred
            FROM h
        """,
        "text_fingerprints": """
            SELECT doc_id,
                   array_to_string(
                     list_slice(list_sort(list(DISTINCT md5(substring(lower(text), cast(i AS int), 8)))), 1, 5),
                     ',') AS fp
            FROM (
              SELECT doc_id, text,
                     unnest(range(1, greatest(length(text) - 7, 1) + 1)) AS i
              FROM documents
            )
            GROUP BY doc_id
        """,
        "similarity_topk": """
            WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
            SELECT vec_id,
                   round(list_cosine_similarity(
                     cast(embedding AS double[]), cast((SELECT qv FROM q) AS double[])), 3) AS cosine
            FROM embeddings
            ORDER BY cosine DESC, vec_id
            LIMIT 10
        """,
        # Planted corpus (see _planted_near_dup_docs): expected pairs are
        # exactly the same-word-cycle families — jaccard 1.0 for
        # o_orderkey % 3 <> 0; the % 3 = 0 families share only 1 of 7
        # shingles (1/7 < 0.8) and must be excluded by the verifier.
        "minhash_near_dup_docs": """
            SELECT 2 * o_orderkey AS a,
                   2 * o_orderkey + 1 AS b,
                   cast(1.0 AS double) AS jaccard
            FROM orders
            WHERE o_orderkey % 3 <> 0
        """,
        # Exact n-gram Jaccard: identical cycles → jaccard exactly 1.0;
        # swapped families → 1/7 < 0.5, excluded by the exact verifier.
        # Greedy set cover replayed: 4 unrolled rounds, each pick the
        # (gain DESC, source ASC) argmax over the uncovered incidence
        # (see q_select_sources).
        "select_sources": """
            WITH docs AS (
              SELECT source, text FROM documents
              UNION ALL
              SELECT 'zz_union', text FROM documents WHERE doc_id % 3 = 0
              UNION ALL
              SELECT 'zz_mirror', text FROM documents WHERE doc_id % 7 = 0
            ),
            sh AS (SELECT DISTINCT source AS s, md5(text) AS h FROM docs),
            p1 AS (
              SELECT s, cast(count(*) AS bigint) AS n FROM sh
              GROUP BY s ORDER BY n DESC, s LIMIT 1
            ),
            u1 AS (
              SELECT * FROM sh WHERE h NOT IN
                (SELECT h FROM sh WHERE s = (SELECT s FROM p1))
            ),
            p2 AS (
              SELECT s, cast(count(*) AS bigint) AS n FROM u1
              GROUP BY s ORDER BY n DESC, s LIMIT 1
            ),
            u2 AS (
              SELECT * FROM u1 WHERE h NOT IN
                (SELECT h FROM u1 WHERE s = (SELECT s FROM p2))
            ),
            p3 AS (
              SELECT s, cast(count(*) AS bigint) AS n FROM u2
              GROUP BY s ORDER BY n DESC, s LIMIT 1
            ),
            u3 AS (
              SELECT * FROM u2 WHERE h NOT IN
                (SELECT h FROM u2 WHERE s = (SELECT s FROM p3))
            ),
            p4 AS (
              SELECT s, cast(count(*) AS bigint) AS n FROM u3
              GROUP BY s ORDER BY n DESC, s LIMIT 1
            )
            SELECT cast(1 AS int) AS rank, s AS source, n AS n_new,
                   n AS n_covered FROM p1
            UNION ALL
            SELECT 2, s, n, (SELECT n FROM p1) + n FROM p2
            UNION ALL
            SELECT 3, s, n,
                   (SELECT n FROM p1) + (SELECT n FROM p2) + n FROM p3
            UNION ALL
            SELECT 4, s, n,
                   (SELECT n FROM p1) + (SELECT n FROM p2)
                   + (SELECT n FROM p3) + n FROM p4
        """,
        # Source overlap: identical mirror construction + md5 identity +
        # hash-keyed self-join (see q_source_overlap).
        "source_overlap": """
            WITH docs AS (
              SELECT source, text FROM documents
              UNION ALL
              SELECT 'zz_mirror' AS source, text FROM documents
              WHERE doc_id % 7 = 0
            ),
            sh AS (SELECT DISTINCT source AS s, md5(text) AS h FROM docs),
            sz AS (SELECT s, cast(count(*) AS bigint) AS n FROM sh GROUP BY s),
            com AS (
              SELECT a.s AS src_a, b.s AS src_b,
                     cast(count(*) AS bigint) AS n_common
              FROM sh a JOIN sh b ON a.h = b.h AND a.s < b.s
              GROUP BY 1, 2
            )
            SELECT com.src_a, com.src_b, com.n_common,
                   round(com.n_common / za.n, 6) AS share_a,
                   round(com.n_common / zb.n, 6) AS share_b
            FROM com
            JOIN sz za ON za.s = com.src_a
            JOIN sz zb ON zb.s = com.src_b
        """,
        # Keep-best survivors: clusters are the analytic jaccard-1.0
        # families {2k, 2k+1} (k%3 != 0); survivor = argmax((id*7)%13,
        # tie min id) (see q_dedup_keep_best).
        "dedup_keep_best": """
            WITH fam AS (
              SELECT o_orderkey AS k,
                     2 * o_orderkey AS a, 2 * o_orderkey + 1 AS b,
                     (2 * o_orderkey * 7) % 13 AS sa,
                     ((2 * o_orderkey + 1) * 7) % 13 AS sb
              FROM orders
            )
            SELECT doc_id, cast(score AS int) AS score FROM (
              -- merged families keep the argmax-score member
              SELECT CASE WHEN sb > sa THEN b ELSE a END AS doc_id,
                     CASE WHEN sb > sa THEN sb ELSE sa END AS score
              FROM fam WHERE k % 3 <> 0
              UNION ALL
              -- below-threshold families survive whole
              SELECT a, sa FROM fam WHERE k % 3 = 0
              UNION ALL
              SELECT b, sb FROM fam WHERE k % 3 = 0
            )
        """,
        # Containment: analytic planted corpus — every non-k%3 small doc
        # sits verbatim in its big sibling: inter 4, C(A→B) 4/4 = 1.0,
        # C(B→A) 4/10 = 0.4 (see q_ngram_containment).
        "ngram_containment": """
            SELECT 2 * o_orderkey AS a,
                   2 * o_orderkey + 1 AS b,
                   cast(4 AS bigint) AS inter,
                   cast(1.0 AS double) AS c_a_in_b,
                   cast(0.4 AS double) AS c_b_in_a
            FROM orders
            WHERE o_orderkey % 3 <> 0
        """,
        "ngram_jaccard": """
            SELECT 2 * o_orderkey AS a,
                   2 * o_orderkey + 1 AS b,
                   cast(1.0 AS double) AS jaccard
            FROM orders
            WHERE o_orderkey % 3 <> 0
        """,
        # Incremental (index-reusing) path over the same planted corpus:
        # every true pair straddles the even/odd = old/new split, so the
        # expected pair set is identical to the full self-join above.
        "minhash_incremental": """
            SELECT 2 * o_orderkey AS a,
                   2 * o_orderkey + 1 AS b,
                   cast(1.0 AS double) AS jaccard
            FROM orders
            WHERE o_orderkey % 3 <> 0
        """,
        # Survivors after exact-pass + LSH + connected components: in a
        # jaccard-1.0 family the min id (2k) survives and 2k+1 drops;
        # 1/7 families are below threshold and survive whole.
        # The evaluation entries rebuild the planted predicted/gold
        # sides verbatim (see _eval_planted_triples), then compute the
        # metric independently with plain joins — every count BIGINT,
        # every ratio one two-integer double division, f1 the same
        # left-associated 2.0*p*r/(p+r) expression Spark evaluates.
        "eval_triple_pr": """
            WITH ks AS (SELECT o_orderkey AS k FROM orders),
            g AS (
              SELECT 'E' || k AS subj,
                     CASE k % 3 WHEN 0 THEN 'RESOLVES_TO'
                                WHEN 1 THEN 'COMMUNICATES_WITH'
                                ELSE 'CONTAINS' END AS pred,
                     'T' || k AS obj
              FROM ks
            ),
            p AS (
              SELECT 'E' || k AS subj,
                     CASE k % 3 WHEN 0 THEN 'RESOLVES_TO'
                                WHEN 1 THEN 'COMMUNICATES_WITH'
                                ELSE 'CONTAINS' END AS pred,
                     CASE WHEN k % 7 = 0 THEN 'X' || k
                          ELSE 'T' || k END AS obj
              FROM ks WHERE k % 5 <> 0
            ),
            c AS (
              SELECT (SELECT count(*) FROM p) AS n_predicted,
                     (SELECT count(*) FROM g) AS n_gold,
                     (SELECT count(*) FROM p
                      JOIN g USING (subj, pred, obj)) AS tp
            ),
            r AS (
              SELECT n_predicted, n_gold, tp,
                     n_predicted - tp AS fp, n_gold - tp AS fn,
                     CASE WHEN n_predicted <> 0 THEN
                       CAST(tp AS DOUBLE) / CAST(n_predicted AS DOUBLE)
                     END AS precision,
                     CASE WHEN n_gold <> 0 THEN
                       CAST(tp AS DOUBLE) / CAST(n_gold AS DOUBLE)
                     END AS recall
              FROM c
            )
            SELECT n_predicted, n_gold, tp, fp, fn, precision, recall,
                   CASE WHEN precision + recall <> 0 THEN
                     2.0 * precision * recall / (precision + recall)
                   END AS f1
            FROM r
        """,
        "eval_triple_pr_by_pred": """
            WITH ks AS (SELECT o_orderkey AS k FROM orders),
            g AS (
              SELECT 'E' || k AS subj,
                     CASE k % 3 WHEN 0 THEN 'RESOLVES_TO'
                                WHEN 1 THEN 'COMMUNICATES_WITH'
                                ELSE 'CONTAINS' END AS pred,
                     'T' || k AS obj
              FROM ks
            ),
            p AS (
              SELECT 'E' || k AS subj,
                     CASE k % 3 WHEN 0 THEN 'RESOLVES_TO'
                                WHEN 1 THEN 'COMMUNICATES_WITH'
                                ELSE 'CONTAINS' END AS pred,
                     CASE WHEN k % 7 = 0 THEN 'X' || k
                          ELSE 'T' || k END AS obj
              FROM ks WHERE k % 5 <> 0
            ),
            np AS (SELECT pred, count(*) AS n_predicted FROM p GROUP BY pred),
            ng AS (SELECT pred, count(*) AS n_gold FROM g GROUP BY pred),
            tp AS (
              SELECT pred, count(*) AS tp
              FROM p JOIN g USING (subj, pred, obj) GROUP BY pred
            ),
            r AS (
              SELECT pred,
                     coalesce(n_predicted, 0) AS n_predicted,
                     coalesce(n_gold, 0) AS n_gold,
                     coalesce(tp, 0) AS tp
              FROM np FULL OUTER JOIN ng USING (pred)
                      FULL OUTER JOIN tp USING (pred)
            ),
            r2 AS (
              SELECT pred, n_predicted, n_gold, tp,
                     CASE WHEN n_predicted <> 0 THEN
                       CAST(tp AS DOUBLE) / CAST(n_predicted AS DOUBLE)
                     END AS precision,
                     CASE WHEN n_gold <> 0 THEN
                       CAST(tp AS DOUBLE) / CAST(n_gold AS DOUBLE)
                     END AS recall
              FROM r
            )
            SELECT pred, n_predicted, n_gold, tp, precision, recall,
                   CASE WHEN precision + recall <> 0 THEN
                     2.0 * precision * recall / (precision + recall)
                   END AS f1
            FROM r2 ORDER BY pred
        """,
        "eval_cluster_pairwise": """
            WITH ks AS (SELECT o_orderkey AS k FROM orders),
            a AS (
              SELECT 'I' || k AS item,
                     CASE WHEN k % 5 = 0 THEN 's' || k
                          ELSE 'p' || CAST(k // 16 AS BIGINT) END AS pc,
                     'g' || CAST(k // 8 AS BIGINT) AS gc
              FROM ks
            ),
            cells AS (SELECT pc, gc, count(*) AS n FROM a GROUP BY pc, gc),
            tot AS (
              SELECT CAST(sum(n) AS BIGINT) AS n_items,
                     CAST(sum(n * (n - 1) // 2) AS BIGINT) AS tp_pairs
              FROM cells
            ),
            pp AS (
              SELECT CAST(sum(np * (np - 1) // 2) AS BIGINT) AS pred_pairs
              FROM (SELECT sum(n) AS np FROM cells GROUP BY pc)
            ),
            gp AS (
              SELECT CAST(sum(ng * (ng - 1) // 2) AS BIGINT) AS gold_pairs
              FROM (SELECT sum(n) AS ng FROM cells GROUP BY gc)
            ),
            r AS (
              SELECT n_items, pred_pairs, gold_pairs, tp_pairs,
                     CASE WHEN pred_pairs <> 0 THEN
                       CAST(tp_pairs AS DOUBLE) / CAST(pred_pairs AS DOUBLE)
                     END AS precision,
                     CASE WHEN gold_pairs <> 0 THEN
                       CAST(tp_pairs AS DOUBLE) / CAST(gold_pairs AS DOUBLE)
                     END AS recall
              FROM tot, pp, gp
            )
            SELECT n_items, pred_pairs, gold_pairs, tp_pairs,
                   precision, recall,
                   CASE WHEN precision + recall <> 0 THEN
                     2.0 * precision * recall / (precision + recall)
                   END AS f1
            FROM r
        """,
        "canonical_map": """
            WITH ks AS (
              SELECT md5(cast(o_orderkey AS varchar)) AS k8,
                     o_orderkey % 2 = 0 AS third
              FROM orders WHERE o_orderkey % 7 = 0
            ),
            v AS (
              SELECT k8, 'GRP-' || k8 || '-X' AS node_id FROM ks
              UNION ALL SELECT k8, 'Grp-' || k8 || '-x' FROM ks
              UNION ALL SELECT k8, 'grp-' || k8 || '-x' FROM ks WHERE third
            ),
            m AS (SELECT k8, min(node_id) AS canon FROM v GROUP BY k8)
            SELECT v.node_id, m.canon AS canonical_id
            FROM v JOIN m USING (k8)
            WHERE v.node_id <> m.canon
            ORDER BY v.node_id
        """,
        "minhash_dedup_survivors": """
            SELECT 2 * o_orderkey + j.j AS doc_id
            FROM orders, (SELECT unnest([0, 1]) AS j) j
            WHERE NOT (j.j = 1 AND o_orderkey % 3 <> 0)
        """,
        # Brute-force simhash pair join over the planted sub-corpus:
        # rebuild each doc's token multiset analytically (reps × 4-word
        # cycle), recompute the 64-bit signature with the shared md5
        # token hash, and emit every pair with hamming <= 3 — the
        # pigeonhole-banded operator is complete for that budget, so the
        # outputs must be identical.
        "simhash_near_dups": """
            WITH d AS (
              SELECT 2 * o_orderkey + j.j AS doc_id,
                     o_orderkey AS k, j.j AS j
              FROM orders, (SELECT unnest([0, 1]) AS j) j
              WHERE o_orderkey % 97 = 0
            ), toks AS (
              SELECT d.doc_id, t.tok
              FROM d
              CROSS JOIN (SELECT unnest(range(0, 7)) AS rep) r
              CROSS JOIN LATERAL (
                SELECT unnest([
                  'wa' || cast(d.k AS varchar),
                  'wb' || cast(d.k AS varchar),
                  'wc' || cast(d.k AS varchar),
                  CASE WHEN d.j = 1 AND d.k % 3 = 0
                       THEN 'we' || cast(d.k AS varchar)
                       ELSE 'wd' || cast(d.k AS varchar) END
                ]) AS tok
              ) t
              WHERE r.rep < 5 + 2 * d.j
            ), bal AS (
              SELECT doc_id, b.bit AS bit,
                     sum(CASE WHEN (md5_number_upper(tok) >> b.bit) & 1 = 1
                              THEN 1 ELSE -1 END) AS balance
              FROM toks, (SELECT unnest(range(0, 64)) AS bit) b
              GROUP BY doc_id, b.bit
            ), sig AS (
              SELECT doc_id,
                     cast(sum(CASE WHEN balance > 0 THEN
                       CASE WHEN bit = 63 THEN -9223372036854775808
                            ELSE (cast(1 AS bigint) << cast(bit AS int)) END
                       ELSE 0 END) AS bigint) AS s
              FROM bal GROUP BY doc_id
            )
            SELECT x.doc_id AS a, y.doc_id AS b,
                   cast(bit_count(xor(x.s, y.s)) AS int) AS hamming
            FROM sig x JOIN sig y ON x.doc_id < y.doc_id
            WHERE bit_count(xor(x.s, y.s)) <= 3
        """,
        # Independent simhash recomputation: md5_number_upper(token) is
        # bit-identical to the kernel's md5-derived 64-bit token hash
        # (first 8 digest bytes, little-endian); two's-complement signed
        # reconstruction via the -2^63 term for bit 63.
        "simhash_signatures": r"""
            WITH toks AS (
              SELECT d.doc_id, t.tok
              FROM documents d,
                   unnest(regexp_split_to_array(lower(d.text), '\s+')) AS t(tok)
              WHERE t.tok <> ''
            ), bal AS (
              SELECT doc_id, j.j AS j,
                     sum(CASE WHEN (md5_number_upper(tok) >> j.j) & 1 = 1
                              THEN 1 ELSE -1 END) AS balance
              FROM toks, (SELECT unnest(range(0, 64)) AS j) j
              GROUP BY doc_id, j.j
            ), sig AS (
              SELECT doc_id,
                     cast(sum(CASE WHEN balance > 0 THEN
                       CASE WHEN j = 63 THEN -9223372036854775808
                            ELSE (cast(1 AS bigint) << cast(j AS int)) END
                       ELSE 0 END) AS bigint) AS simhash
              FROM bal GROUP BY doc_id
            )
            SELECT d.doc_id, coalesce(s.simhash, 0) AS simhash
            FROM documents d LEFT JOIN sig s ON d.doc_id = s.doc_id
        """,
        # Planted vectors (see _planted_vectors): the oracle brute-forces
        # the exact top-k; the construction guarantees the approximate
        # searches return the same set (t=0 vectors are exact positive
        # multiples of the query).
        "similarity_lsh_topk": f"""
            WITH v AS ({_PLANTED_VECTORS_SQL})
            SELECT vec_id,
                   round(list_cosine_similarity(emb,
                     [1.0,0.0,0.0,0.0,0.0,0.0,0.0,0.0]), 3) AS cosine
            FROM v
            ORDER BY list_cosine_similarity(emb,
                     [1.0,0.0,0.0,0.0,0.0,0.0,0.0,0.0]) DESC, vec_id
            LIMIT 10
        """,
        "similarity_ivf_topk": f"""
            WITH v AS ({_PLANTED_VECTORS_SQL})
            SELECT vec_id,
                   round(list_cosine_similarity(emb,
                     [1.0,0.0,0.0,0.0,0.0,0.0,0.0,0.0]), 3) AS cosine
            FROM v
            ORDER BY list_cosine_similarity(emb,
                     [1.0,0.0,0.0,0.0,0.0,0.0,0.0,0.0]) DESC, vec_id
            LIMIT 10
        """,
        # Exact brute-force pair join over the planted basis vectors;
        # the banded-LSH operator must reproduce it exactly (cosines are
        # exactly 1.0 within a direction, exactly 0.0 across).
        # Clusters are exactly the same-direction families (all pairwise
        # cosine 1.0) → survivor = min vec_id per direction class.
        "embedding_dedup_survivors": """
            WITH v AS (
              SELECT 2 * o_orderkey + j.j AS vec_id,
                     (o_orderkey // 199) % 64 AS dir
              FROM orders, (SELECT unnest([0, 1]) AS j) j
              WHERE o_orderkey % 199 = 0
            )
            SELECT min(vec_id) AS vec_id FROM v GROUP BY dir
        """,
        "embedding_near_dups": """
            WITH v AS (
              SELECT 2 * o_orderkey + j.j AS vec_id,
                     list_transform(range(0, 64), i ->
                       CASE WHEN i = (o_orderkey // 199) % 64
                            THEN cast(j.j + 1 AS double) ELSE 0.0 END) AS emb
              FROM orders, (SELECT unnest([0, 1]) AS j) j
              WHERE o_orderkey % 199 = 0
            )
            SELECT va.vec_id AS a, vb.vec_id AS b,
                   round(list_cosine_similarity(va.emb, vb.emb), 3) AS cosine
            FROM v va JOIN v vb ON va.vec_id < vb.vec_id
            WHERE list_cosine_similarity(va.emb, vb.emb) >= 0.9
        """,
        "ngram_decontaminate": r"""
            WITH dtok AS (
              SELECT doc_id,
                     regexp_split_to_array(trim(lower(text)), '\s+') AS toks
              FROM documents
            ),
            ev AS (
              SELECT doc_id AS eval_id,
                     regexp_split_to_array(
                       trim(lower(array_to_string(toks[1:12], ' '))), '\s+'
                     ) AS toks
              FROM dtok WHERE doc_id % 25 = 0
            ),
            didx AS (
              SELECT doc_id, toks,
                     unnest(generate_series(1, len(toks) - 2)) AS i
              FROM dtok
            ),
            dg AS (
              SELECT DISTINCT doc_id, array_to_string(toks[i:i+2], ' ') AS gram
              FROM didx
            ),
            eidx AS (
              SELECT eval_id, toks,
                     unnest(generate_series(1, len(toks) - 2)) AS i
              FROM ev
            ),
            eg AS (
              SELECT DISTINCT eval_id, array_to_string(toks[i:i+2], ' ') AS gram
              FROM eidx
            )
            SELECT dg.doc_id, eg.eval_id,
                   cast(count(DISTINCT dg.gram) AS bigint) AS shared_ngrams
            FROM dg JOIN eg USING (gram)
            GROUP BY dg.doc_id, eg.eval_id
        """,
        "sample_stratified": """
            SELECT o_orderkey, o_orderstatus
            FROM orders
            WHERE md5_number_upper('sample:' || cast(o_orderkey AS varchar))
                  % 1000000
                  < CASE o_orderstatus WHEN 'O' THEN 100000
                                       WHEN 'F' THEN 50000
                                       WHEN 'P' THEN 500000
                                       ELSE 0 END
        """,
        # Composed curation pipeline over the planted corpus (see
        # q_curate_corpus): each stage filter is SQL; the near-dedup
        # stage uses the ANALYTIC survivor set (jaccard-1.0 same-cycle
        # families, min id kept) that minhash_near_dup_docs proves the
        # operator computes.
        "curate_increment": """
            WITH ks AS (
              SELECT o_orderkey AS k FROM orders WHERE o_orderkey % 7 = 0
            )
            SELECT 1 AS batch, cast(k * 10 AS bigint) AS doc_id,
                   CASE WHEN k % 5 = 0 THEN 'contaminated'
                        ELSE 'accepted' END AS status
            FROM ks
            UNION ALL
            SELECT 2, cast(k * 10 + (SELECT 10 * max(k) + 10 FROM ks) AS bigint),
                   CASE k % 4 WHEN 0 THEN 'exact_dup'
                              WHEN 1 THEN 'near_dup'
                              WHEN 2 THEN 'accepted'
                              ELSE 'language' END
            FROM ks
        """,
        "curate_corpus": rf"""
            WITH pdocs AS (
              SELECT cast(2 * o_orderkey + j.j AS bigint) AS doc_id,
                     trim(repeat(
                       'wa' || cast(o_orderkey AS varchar)
                       || ' wb' || cast(o_orderkey AS varchar)
                       || ' wc' || cast(o_orderkey AS varchar) || ' '
                       || (CASE WHEN j.j = 1 AND o_orderkey % 3 = 0
                                THEN 'we' ELSE 'wd' END)
                       || cast(o_orderkey AS varchar) || ' ',
                       CASE WHEN j.j = 0 THEN 5 ELSE 7 END)) AS text
              FROM orders CROSS JOIN (SELECT unnest([0, 1]) AS j) j
              WHERE o_orderkey % 7 = 0
            ),
            corpus AS (
              SELECT * FROM pdocs
              UNION ALL
              SELECT cast(doc_id AS bigint), text FROM (VALUES
                (-301, 'A. B. C.'),
                (-302, 'el la de que y un los se no por el la de que y un los se no por'),
                (-201, 'the and of to in it is was for on the and of to in it is was for on'),
                (-200, 'the and of to in it is was for on the and of to in it is was for on')
              ) AS extras(doc_id, text)
            ),
            feat AS (
              SELECT doc_id, text,
                     length(text) AS n_chars,
                     len(regexp_split_to_array(trim(lower(text)), '\s+')) AS n_toks,
                     length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS n_punct,
                     length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')) AS n_upper,
                     len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                         x -> list_contains([{en}], x))) AS hits_en,
                     len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                         x -> list_contains([{es}], x))) AS hits_es,
                     len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                         x -> list_contains([{de}], x))) AS hits_de
              FROM corpus
            ),
            scored AS (
              -- round(…, 6) BEFORE the threshold filter: the operator's
              -- quality_score returns the rounded value and
              -- curate_documents filters on THAT, so the oracle must
              -- compare the same quantity (review finding r4)
              SELECT doc_id, text, n_toks,
                     round(least(n_toks / 64.0, 1.0) * 0.3
                       + least((hits_en * 1.0 / n_toks) * 4.0, 1.0) * 0.4
                       + (1.0 - least((n_punct * 1.0 / n_chars) * 10.0, 1.0)) * 0.2
                       + (1.0 - least((n_upper * 1.0 / n_chars) * 5.0, 1.0)) * 0.1,
                     6) AS quality,
                     CASE WHEN hits_es > hits_en AND hits_es >= hits_de THEN 'es'
                          WHEN hits_de > hits_en AND hits_de > hits_es THEN 'de'
                          ELSE 'en' END AS lang_pred
              FROM feat
            ),
            filtered AS (
              SELECT * FROM scored WHERE quality >= 0.3 AND lang_pred = 'en'
            ),
            exact AS (
              SELECT * FROM filtered
              QUALIFY doc_id = min(doc_id) OVER (PARTITION BY md5(text))
            ),
            neardup AS (
              -- analytic minhash survivors: j=1 of a same-cycle family
              -- (k % 3 <> 0) is the non-min member of a jaccard-1.0
              -- cluster; nothing else has a >= 0.8 partner
              SELECT * FROM exact
              WHERE NOT (doc_id >= 0 AND doc_id % 2 = 1
                         AND ((doc_id - 1) // 2) % 3 <> 0)
            ),
            decon AS (
              -- contaminated = the j=0 source docs of the k % 5 = 0
              -- eval items (their 8-grams all contain 'wd<k>', absent
              -- from every other survivor)
              SELECT * FROM neardup
              WHERE NOT (doc_id >= 0 AND doc_id % 10 = 0)
            ),
            split_tok AS (
              SELECT doc_id, quality, lang_pred,
                     cast(n_toks AS bigint) AS n_tokens,
                     CASE WHEN md5_number_upper('split:' || cast(doc_id AS varchar))
                               % 1000000 < 900000
                          THEN 'train' ELSE 'val' END AS split
              FROM decon
            )
            SELECT doc_id, round(quality, 6) AS quality, lang_pred, split,
                   n_tokens,
                   cast(floor(coalesce(sum(n_tokens) OVER (
                     PARTITION BY split ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) / 64) AS bigint) AS pack_id
            FROM split_tok
        """,
        # Water level T = min(count_s / share_s) and per-source
        # thresholds recomputed in the identical double expression
        # order: ((1000000 * share) * T) / count. Shares cast to double
        # (bare 0.5 is DECIMAL in DuckDB).
        "sample_mixture": """
            WITH cnt AS (
              SELECT o_orderstatus AS src, count(*) AS n
              FROM orders WHERE o_orderstatus IN ('O', 'F', 'P')
              GROUP BY o_orderstatus
            ),
            tm AS (
              SELECT min(n / (CASE src WHEN 'O' THEN cast(0.5 AS double)
                                       WHEN 'F' THEN cast(0.3 AS double)
                                       ELSE cast(0.2 AS double) END)) AS t
              FROM cnt
            )
            SELECT o_orderkey, o_orderstatus
            FROM orders o
            JOIN cnt ON cnt.src = o.o_orderstatus
            CROSS JOIN tm
            WHERE md5_number_upper('mixture:' || cast(o_orderkey AS varchar))
                    % 1000000
                  < ((1000000 * (CASE o_orderstatus
                                 WHEN 'O' THEN cast(0.5 AS double)
                                 WHEN 'F' THEN cast(0.3 AS double)
                                 ELSE cast(0.2 AS double) END)) * tm.t) / cnt.n
        """,
        "split_oversized_docs": r"""
            WITH t AS (
              SELECT doc_id,
                     regexp_split_to_array(trim(coalesce(text, '')), '\s+') AS toks
              FROM documents
            ),
            p AS (
              SELECT doc_id, toks,
                     unnest(range(cast(ceil(len(toks) / cast(40 AS double))
                                       AS bigint))) AS i
              FROM t
            )
            SELECT doc_id,
                   cast(i AS int) AS piece_idx,
                   array_to_string(toks[(i * 40 + 1):(i * 40 + 40)], ' ') AS text,
                   cast(len(regexp_split_to_array(
                     array_to_string(toks[(i * 40 + 1):(i * 40 + 40)], ' '),
                     '\s+')) AS bigint) AS n_tokens
            FROM p
        """,
        # Same PII_PATTERNS strings, applied in the same order, under
        # RE2 — the chain is generated from the operator's own pattern
        # list so the two sides cannot drift.
        "text_scrub_pii": _pii_oracle_sql(),
        "text_repetition_ratio": """
            WITH sh AS (
              SELECT doc_id, substring(lower(text), cast(i AS int), 8) AS s
              FROM (
                SELECT doc_id, text,
                       unnest(range(1, greatest(length(text) - 7, 1) + 1)) AS i
                FROM documents
              )
            )
            SELECT doc_id,
                   round(1.0 - cast(count(DISTINCT s) AS double) / count(*), 6)
                     AS rep_ratio
            FROM sh GROUP BY doc_id
        """,
        "graph_label_propagation": _lpa_oracle_sql(iterations=4),
        "graph_anf": _anf_oracle_sql(hops=2, m=16),
        # Walk enumeration with UNION dedup (recursion bounded: (id, d)
        # pairs are finite under the d < 30 guard), min per node — an
        # independent algorithm from the operator's frontier expansion.
        "graph_bfs_distances": """
            WITH RECURSIVE
            e AS (
              SELECT 'n' || cast(n_nationkey AS varchar) AS src,
                     'n' || cast((n_nationkey + 1) % 25 AS varchar) AS dst
              FROM nation
              UNION ALL
              SELECT 'n' || cast(n_nationkey AS varchar),
                     'r' || cast(n_regionkey AS varchar)
              FROM nation
            ),
            walk(id, d) AS (
              SELECT 'n0', 0
              UNION
              SELECT e.dst, walk.d + 1
              FROM walk JOIN e ON walk.id = e.src
              WHERE walk.d < 30
            )
            SELECT id, cast(min(d) AS int) AS dist FROM walk GROUP BY id
        """,
        # Independent recursive-CTE transitive closure with
        # min-reachable-id labeling (not the analytic chain answer —
        # a genuinely different algorithm from the operator's
        # label-propagation/star contraction).
        "graph_connected_components": """
            WITH RECURSIVE
            ks AS (SELECT o_orderkey AS k FROM orders WHERE o_orderkey % 11 = 0),
            e AS (
              SELECT 5 * k + i.i AS s, 5 * k + i.i + 1 AS d
              FROM ks CROSS JOIN (SELECT unnest(range(4)) AS i) i
            ),
            sym AS (SELECT s, d FROM e UNION SELECT d, s FROM e),
            nodes AS (SELECT DISTINCT s AS id FROM sym),
            reach(id, r) AS (
              SELECT id, id FROM nodes
              UNION
              SELECT reach.id, sym.d FROM reach JOIN sym ON reach.r = sym.s
            )
            SELECT cast(id AS bigint) AS id,
                   cast(min(r) AS bigint) AS component
            FROM reach GROUP BY id
        """,
        "graph_triangle_count": """
            WITH ks AS (SELECT o_orderkey AS k FROM orders WHERE o_orderkey % 13 = 0),
            e0 AS (
              SELECT 3 * k AS s, 3 * k + 1 AS d FROM ks
              UNION ALL SELECT 3 * k + 1, 3 * k + 2 FROM ks
              UNION ALL SELECT 3 * k, 3 * k + 2 FROM ks
              UNION ALL SELECT 3 * k + 2, 3 * k + 3 FROM ks
            ),
            e AS (SELECT DISTINCT least(s, d) AS a, greatest(s, d) AS b FROM e0),
            tri AS (
              SELECT e1.a AS x, e1.b AS y, e2.b AS z
              FROM e e1
              JOIN e e2 ON e1.b = e2.a
              JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
            ),
            corners AS (
              SELECT x AS id FROM tri
              UNION ALL SELECT y FROM tri
              UNION ALL SELECT z FROM tri
            ),
            nodes AS (SELECT s AS id FROM e0 UNION SELECT d AS id FROM e0)
            SELECT cast(n.id AS bigint) AS id,
                   cast(coalesce(c.cnt, 0) AS bigint) AS triangles
            FROM nodes n
            LEFT JOIN (SELECT id, count(*) AS cnt FROM corners GROUP BY id) c
              USING (id)
        """,
        "graph_node_similarity": """
            WITH nb AS (
              SELECT DISTINCT l_partkey AS node, l_suppkey AS nbr
              FROM lineitem WHERE l_partkey % 20 = 0
            ),
            deg AS (SELECT node, count(*) AS deg FROM nb GROUP BY node),
            inter AS (
              SELECT x.node AS a, y.node AS b, count(*) AS n_common
              FROM nb x JOIN nb y ON x.nbr = y.nbr AND x.node < y.node
              GROUP BY x.node, y.node
            )
            SELECT cast(a AS bigint) AS a, cast(b AS bigint) AS b,
                   round(cast(n_common AS double) / (da.deg + db.deg - n_common), 6)
                     AS jaccard
            FROM inter
            JOIN deg da ON da.node = inter.a
            JOIN deg db ON db.node = inter.b
            WHERE cast(n_common AS double) / (da.deg + db.deg - n_common) >= 0.2
        """,
        # planted star gadgets (see q_graph_link_prediction): the same
        # through-node self-join + degree arithmetic as the
        # node-similarity oracle, plus the NOT EXISTS adjacency
        # anti-join; round-6 BEFORE compare on the double sums (the
        # tfidf discipline — addition order varies per engine).
        "graph_link_prediction": """
            WITH o AS (
              SELECT o_orderkey AS k FROM orders WHERE o_orderkey % 23 = 0
            ),
            e AS (
              SELECT 'o'||k||'_0' AS a, 'o'||k||'_'||i AS b
              FROM o CROSS JOIN (VALUES (1),(2),(3),(4)) t(i)
              UNION ALL
              SELECT 'o'||k||'_1', 'o'||k||'_2' FROM o
            ),
            sym AS (
              SELECT a AS node, b AS nbr FROM e
              UNION ALL SELECT b, a FROM e
            ),
            deg AS (SELECT node, count(*) AS deg FROM sym GROUP BY node),
            thru AS (
              SELECT s.nbr AS z, d.deg AS z_deg, s.node AS leaf
              FROM sym s JOIN deg d ON d.node = s.nbr
            ),
            cand AS (
              SELECT x.leaf AS a, y.leaf AS b,
                     count(*) AS cn,
                     sum(1.0/ln(x.z_deg)) AS aa,
                     sum(1.0/x.z_deg) AS ra
              FROM thru x JOIN thru y ON x.z = y.z AND x.leaf < y.leaf
              GROUP BY x.leaf, y.leaf
            )
            SELECT c.a, c.b,
                   cast(cn AS int) AS common_neighbors,
                   round(aa, 6) AS adamic_adar,
                   round(ra, 6) AS resource_allocation,
                   cast(da.deg * db.deg AS bigint) AS preferential_attachment
            FROM cand c
            JOIN deg da ON da.node = c.a
            JOIN deg db ON db.node = c.b
            WHERE NOT EXISTS (
              SELECT 1 FROM e WHERE e.a = c.a AND e.b = c.b
            )
        """,
        "graph_pagerank": _pagerank_oracle_sql(iterations=3, damping=0.85),
        "graph_pagerank_weighted": _pagerank_oracle_sql(
            iterations=3, damping=0.85, weighted=True
        ),
        "graph_pagerank_personalized": _pagerank_oracle_sql(
            iterations=3, damping=0.85, seeds=("n0", "n12", "r2")
        ),
        "graph_pagerank_delta": _pagerank_delta_oracle_sql(
            iterations=3, damping=0.85
        ),
        # Cypher-lite entries: the oracle replays the planted-store
        # semantics (see _cypher_graph) directly in SQL.
        "cypher_match_filter": """
            SELECT 'm' || cast(o_orderkey AS varchar) AS malware,
                   'a' || cast(o_orderkey AS varchar) || '.evil.net' AS domain
            FROM orders
            WHERE o_orderkey % 31 = 0 AND o_orderkey % 10 > 5
        """,
        "cypher_two_hop_count": """
            SELECT cast(o_orderkey % 10 AS varchar) AS size,
                   count(*) AS n
            FROM orders
            WHERE o_orderkey % 31 = 0
            GROUP BY 1
        """,
        # graph summary card (see q_graph_stats): identical sum
        # arithmetic; round-6 on the ratios.
        "graph_stats": """
            WITH e0 AS (""" + _CHAIN_REGION_EDGES_SQL + """),
            e AS (
              SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
              FROM e0 WHERE src <> dst
            ),
            ends AS (SELECT a AS id FROM e UNION ALL SELECT b FROM e),
            deg AS (SELECT id, count(*) AS deg FROM ends GROUP BY id),
            jk0 AS (
              SELECT da.deg AS j, db.deg AS k
              FROM e
              JOIN deg da ON da.id = e.a
              JOIN deg db ON db.id = e.b
            ),
            jk AS (SELECT j, k FROM jk0 UNION ALL SELECT k, j FROM jk0),
            agg AS (
              SELECT count(*) AS m2,
                     sum(cast(j AS double) * k) AS sjk,
                     sum(cast(j AS double)) AS sj,
                     sum(cast(j AS double) * j) AS sj2
              FROM jk
            ),
            st AS (
              SELECT count(*) AS n_nodes, max(deg) AS max_degree,
                     sum(deg) AS deg_sum
              FROM deg
            )
            SELECT cast(n_nodes AS bigint) AS n_nodes,
                   cast(deg_sum / 2 AS bigint) AS n_edges,
                   round(cast(deg_sum AS double) / n_nodes, 6) AS avg_degree,
                   cast(max_degree AS int) AS max_degree,
                   round((sjk/m2 - (sj/m2)*(sj/m2))
                         / (sj2/m2 - (sj/m2)*(sj/m2)), 6) AS assortativity
            FROM st, agg
        """,
        "graph_kcore": _kcore_oracle_sql(k=2, iterations=20),
        "graph_diameter": """
            WITH RECURSIVE
            e0 AS (""" + _CHAIN_REGION_EDGES_SQL + """),
            e AS (
              SELECT src AS u, dst AS v FROM e0
              UNION
              SELECT dst, src FROM e0
            ),
            seedv AS (SELECT min(u) AS id FROM e),
            w1(id, d) AS (
              SELECT id, 0 FROM seedv
              UNION
              SELECT e.v, w1.d + 1 FROM w1 JOIN e ON w1.id = e.u
              WHERE w1.d < 60
            ),
            d1 AS (SELECT id, min(d) AS dist FROM w1 GROUP BY id),
            p1 AS (SELECT id, dist FROM d1 ORDER BY dist DESC, id LIMIT 1),
            w2(id, d) AS (
              SELECT id, 0 FROM p1
              UNION
              SELECT e.v, w2.d + 1 FROM w2 JOIN e ON w2.id = e.u
              WHERE w2.d < 60
            ),
            d2 AS (SELECT id, min(d) AS dist FROM w2 GROUP BY id),
            p2 AS (SELECT id, dist FROM d2 ORDER BY dist DESC, id LIMIT 1)
            SELECT s.id AS seed, p1.id AS peripheral, p2.id AS far_node,
                   cast(p2.dist AS int) AS diameter_lb,
                   cast(0 AS boolean) AS truncated
            FROM seedv s, p1, p2
        """,
        "graph_ktruss": _ktruss_oracle_sql(k=4, iterations=6),
        # per-seed BFS walk + harmonic sum; round-6 BEFORE compare (the
        # tfidf discipline — double addition order varies per engine).
        "graph_harmonic_closeness": f"""
            WITH RECURSIVE
            e AS ({_CHAIN_REGION_EDGES_SQL}),
            walk(s, id, d) AS (
              SELECT id, id, 0 FROM (VALUES ('n0'), ('n5'), ('r2')) AS seeds(id)
              UNION
              SELECT walk.s, e.dst, walk.d + 1
              FROM walk JOIN e ON walk.id = e.src
              WHERE walk.d < 30
            ),
            md AS (SELECT s, id, min(d) AS d FROM walk GROUP BY s, id)
            SELECT id, round(sum(1.0 / d), 6) AS closeness
            FROM md WHERE d > 0 GROUP BY id
        """,
        "graph_sssp_weighted": _sssp_oracle_sql(iterations=12),
        # The planted MSF is analytic: chords (i, i+2) are each the
        # unique heaviest edge of their triangle, so Borůvka's answer
        # is exactly the path — selected here by the weight rule.
        "graph_mst": """
            WITH idx AS (
              SELECT i FROM (
                SELECT row_number() OVER (ORDER BY o_orderkey) - 1 AS i
                FROM orders
              ) WHERE i < 256
            )
            SELECT a.i AS src, b.i AS dst,
                   cast(100 * (a.i % 2) + a.i + 10 AS double) AS weight
            FROM idx a JOIN idx b ON b.i = a.i + 1
        """,
        "transcript_pii_audit": _pii_audit_oracle_sql(),
        # Closed-form single-linkage clusters at threshold 109 on the
        # planted graph: pairs {2k, 2k+1} while even-edge weights
        # (i + 10) stay ≤ 109, singletons beyond; cluster labels are
        # min-id per component, matching connected_components.
        "graph_single_linkage": """
            WITH idx AS (
              SELECT i FROM (
                SELECT row_number() OVER (ORDER BY o_orderkey) - 1 AS i
                FROM orders
              ) WHERE i < 256
            )
            SELECT i AS id,
                   CASE WHEN i <= 99 THEN i - (i % 2) ELSE i END AS cluster
            FROM idx
        """,
        "graph_betweenness": _betweenness_oracle_sql(levels=13),
        "table_checks": """
            WITH a AS (
              SELECT
                cast(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS bigint) AS c0,
                cast(count(*) - count(DISTINCT coalesce(cast(o_orderkey AS varchar), chr(0) || 'null')) AS bigint) AS c1,
                cast(sum(CASE WHEN o_orderstatus IS NULL
                              OR o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END) AS bigint) AS c2,
                cast(sum(CASE WHEN o_totalprice IS NULL
                              OR o_totalprice < 0.0 OR o_totalprice > 1000000000.0 THEN 1 ELSE 0 END) AS bigint) AS c3,
                cast(sum(CASE WHEN o_orderpriority IS NULL
                              OR NOT regexp_matches(o_orderpriority, '^[1-5]-')
                         THEN 1 ELSE 0 END) AS bigint) AS c4
              FROM orders
            )
            SELECT 'not_null(o_orderkey)' AS check, c0 AS violations, c0 = 0 AS passed FROM a
            UNION ALL SELECT 'unique(o_orderkey)', c1, c1 = 0 FROM a
            UNION ALL SELECT 'in_set(o_orderstatus)', c2, c2 = 0 FROM a
            UNION ALL SELECT 'in_range(o_totalprice)', c3, c3 = 0 FROM a
            UNION ALL SELECT 'matches(o_orderpriority)', c4, c4 = 0 FROM a
        """,
        # Filtered TransE negative sampling: identical md5 side/index
        # draws, dense row_number entity index, degenerate-draw filter,
        # and true-triple anti-join (see q_kg_negative_samples).
        "kg_negative_samples": """
            WITH tri AS (
              SELECT 's' || cast(s_suppkey AS varchar) AS subj,
                     'LOCATED_IN' AS pred,
                     'n' || cast(s_nationkey AS varchar) AS obj
              FROM supplier
              UNION ALL
              SELECT 'c' || cast(c_custkey AS varchar), 'LOCATED_IN',
                     'n' || cast(c_nationkey AS varchar)
              FROM customer
              UNION ALL
              SELECT 'n' || cast(n_nationkey AS varchar), 'PART_OF',
                     'r' || cast(n_regionkey AS varchar)
              FROM nation
            ),
            true_t AS (SELECT DISTINCT subj, pred, obj FROM tri),
            ents AS (
              SELECT id, row_number() OVER (ORDER BY id) - 1 AS eidx
              FROM (SELECT subj AS id FROM true_t
                    UNION SELECT obj FROM true_t)
            ),
            ne AS (SELECT count(*) AS n FROM ents),
            ex AS (
              SELECT subj, pred, obj, cast(i AS integer) AS sample_idx,
                     subj || '|' || pred || '|' || obj || '|'
                       || cast(i AS varchar) AS key
              FROM true_t CROSS JOIN (SELECT unnest(range(2)) AS i)
            ),
            drawn AS (
              SELECT ex.*,
                     cast(md5_number_upper('negside:' || key) % 2
                          AS integer) AS side,
                     cast(md5_number_upper('neg:' || key) % ne.n
                          AS bigint) AS didx
              FROM ex CROSS JOIN ne
            ),
            neg AS (
              SELECT CASE WHEN side = 0 THEN e.id ELSE d.subj END AS subj,
                     d.pred,
                     CASE WHEN side = 1 THEN e.id ELSE d.obj END AS obj,
                     CASE WHEN side = 0 THEN 'head' ELSE 'tail' END
                       AS corrupted,
                     d.sample_idx,
                     d.subj AS pos_subj, d.obj AS pos_obj
              FROM drawn d JOIN ents e ON d.didx = e.eidx
              WHERE (side = 0 AND e.id <> d.subj)
                 OR (side = 1 AND e.id <> d.obj)
            )
            SELECT n.subj, n.pred, n.obj, n.corrupted, n.sample_idx,
                   n.pos_subj, n.pos_obj
            FROM neg n
            WHERE NOT EXISTS (
              SELECT 1 FROM true_t t
              WHERE t.subj = n.subj AND t.pred = n.pred AND t.obj = n.obj
            )
        """,
        # NPMI collocation over (user, hour) contexts — identical integer
        # counts, identical exact-double quotients into ln, round(6)
        # before compare (see q_events_cooccur_npmi).
        "events_cooccur_npmi": """
            WITH inc AS (
              SELECT DISTINCT
                     cast(user_id AS varchar) || '|' ||
                       cast(epoch_us(ts) // 1000000 // 3600 AS varchar) AS g,
                     event_type AS item
              FROM events
              WHERE user_id IS NOT NULL AND event_type IS NOT NULL
            ),
            n AS (SELECT cast(count(DISTINCT g) AS bigint) AS n_groups
                  FROM inc),
            marg AS (SELECT item, cast(count(*) AS bigint) AS n_i
                     FROM inc GROUP BY item),
            pairs AS (
              SELECT a.item AS item_a, b.item AS item_b,
                     cast(count(*) AS bigint) AS n_ab
              FROM inc a JOIN inc b ON a.g = b.g AND a.item < b.item
              GROUP BY 1, 2
              HAVING count(*) >= 2
            )
            SELECT p.item_a, p.item_b, p.n_ab,
                   ma.n_i AS n_a, mb.n_i AS n_b,
                   round(CASE WHEN p.n_ab = n.n_groups THEN 1.0
                         ELSE ln(p.n_ab * n.n_groups / (ma.n_i * mb.n_i))
                              / -ln(p.n_ab / n.n_groups) END, 6) AS npmi
            FROM pairs p
            JOIN marg ma ON p.item_a = ma.item
            JOIN marg mb ON p.item_b = mb.item
            CROSS JOIN n
        """,
        "graph_node2vec": _node2vec_cte_sql(4, 2, 4.0, 0.25)
        + """
            SELECT walk_id, start_id, step, node FROM walks
        """,
        "similarity_pq_topk": _pq_oracle_sql(
            m=4, k_sub=4, iterations=2, scale=1024, k=10, rf=4, dim=64
        ),
        # Temperature mixture: identical sqrt weights, water level, and
        # pinned threshold evaluation order (1e6 · w · T / n) — see
        # q_sample_temperature / operators.packing.temperature_mixture.
        "sample_temperature": """
            WITH c AS (
              SELECT o_orderstatus AS s, cast(count(*) AS bigint) AS n
              FROM orders WHERE o_orderstatus IS NOT NULL GROUP BY 1
            ),
            w AS (SELECT s, n, sqrt(cast(n AS double)) AS wgt FROM c),
            t AS (SELECT min(n / wgt) AS tmax FROM w),
            r AS (
              SELECT s, 1000000.0 * wgt * t.tmax / n AS thresh
              FROM w CROSS JOIN t
            )
            SELECT o.o_orderkey, o.o_orderstatus
            FROM orders o JOIN r ON o.o_orderstatus = r.s
            WHERE cast(md5_number_upper('mixture-temp:'
                    || cast(o_orderkey AS varchar)) % 1000000 AS double)
                  < r.thresh
        """,
        "events_zorder_key": f"""
            SELECT event_id,
                   cast({_morton_sql(['user_id', 'floor(value)'], 16)}
                     AS bigint) AS zkey
            FROM events
        """,
        "graph_eigenvector": _eigenvector_oracle_sql(3),
        # CMS join-size estimate: identical cells, bucketwise integer
        # dot products, min over rows (see q_cms_join_size).
        "cms_join_size": """
            WITH ca AS (
              SELECT r.i AS row,
                     cast(md5_number_upper('cmsj' || r.i || ':'
                          || cast(o_custkey AS varchar)) % 512
                       AS bigint) AS bucket,
                     count(*) AS na
              FROM orders CROSS JOIN (VALUES (0),(1),(2)) r(i)
              GROUP BY 1, 2
            ),
            cb AS (
              SELECT r.i AS row,
                     cast(md5_number_upper('cmsj' || r.i || ':'
                          || cast(c_custkey AS varchar)) % 512
                       AS bigint) AS bucket,
                     count(*) AS nb
              FROM customer CROSS JOIN (VALUES (0),(1),(2)) r(i)
              GROUP BY 1, 2
            ),
            per_row AS (
              SELECT ca.row, sum(ca.na * cb.nb) AS dot
              FROM ca JOIN cb USING (row, bucket)
              GROUP BY ca.row
            )
            SELECT cast(min(dot) AS bigint) AS est_join_size FROM per_row
        """,
        # Percentile-calibrated quality gate: the quality_score chain +
        # identical nearest-rank threshold picks (see q_quality_gate).
        "quality_gate": rf"""
            WITH m AS (
              SELECT doc_id, source,
                     length(text) AS n_chars,
                     len(regexp_split_to_array(trim(lower(text)), '\s+')) AS n_tokens,
                     length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS n_punct,
                     length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')) AS n_upper,
                     len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                         x -> list_contains([{en}], x))) AS hits
              FROM documents
            ),
            sc AS (
              SELECT doc_id, source AS "group",
                     round(
                       least(n_tokens / 64.0, 1.0) * 0.3
                       + least((hits * 1.0 / n_tokens) * 4.0, 1.0) * 0.4
                       + (1.0 - least((n_punct * 1.0 / n_chars) * 10.0, 1.0)) * 0.2
                       + (1.0 - least((n_upper * 1.0 / n_chars) * 5.0, 1.0)) * 0.1,
                     6) AS quality
              FROM m
            ),
            r AS (
              SELECT *, row_number() OVER (PARTITION BY "group"
                          ORDER BY quality, doc_id) AS rn,
                        count(*) OVER (PARTITION BY "group") AS n
              FROM sc
            ),
            thr AS (
              SELECT "group", quality AS threshold FROM r
              WHERE rn = cast(ceil(cast(0.25 AS double) * n) AS bigint)
            )
            SELECT sc.doc_id, sc."group", sc.quality, thr.threshold
            FROM sc JOIN thr ON sc."group" = thr."group"
            WHERE sc.quality >= thr.threshold
        """,
        # Robust MAD outliers: identical nearest-rank medians (same
        # physical rows via (value, id) order) and the rounded modified
        # z (see q_events_mad_outliers).
        "events_mad_outliers": """
            WITH b AS (
              SELECT event_id AS id, event_type AS grp,
                     cast(value AS double) AS x
              FROM events
              WHERE value IS NOT NULL AND event_type IS NOT NULL
            ),
            r1 AS (
              SELECT *, row_number() OVER (PARTITION BY grp
                                           ORDER BY x, id) AS rn,
                        count(*) OVER (PARTITION BY grp) AS n
              FROM b
            ),
            med AS (
              SELECT grp, x AS med FROM r1
              WHERE rn = cast(ceil(n / 2.0) AS bigint)
            ),
            d AS (
              SELECT b.id, b.grp, b.x, med.med,
                     abs(b.x - med.med) AS adev
              FROM b JOIN med ON b.grp = med.grp
            ),
            r2 AS (
              SELECT *, row_number() OVER (PARTITION BY grp
                                           ORDER BY adev, id) AS rn,
                        count(*) OVER (PARTITION BY grp) AS n
              FROM d
            ),
            mad AS (
              SELECT grp, adev AS mad FROM r2
              WHERE rn = cast(ceil(n / 2.0) AS bigint)
            ),
            scored AS (
              SELECT d.id, d.grp AS "group", d.x AS value,
                     round(CASE WHEN mad.mad > 0
                           THEN cast(0.6745 AS double) * (d.x - d.med)
                                / mad.mad
                           ELSE 0.0 END, 6) AS robust_z
              FROM d JOIN mad ON d.grp = mad.grp
            )
            SELECT id, "group", value, robust_z FROM scored
            WHERE abs(robust_z) >= 2.0
            ORDER BY abs(robust_z) DESC, id
            LIMIT 20
        """,
        # Conductance: identical directed-pair cut/volume integers and
        # the min-denominator division (see q_graph_conductance).
        "graph_conductance": """
            WITH nk AS (
              SELECT n_nationkey AS k FROM nation WHERE n_nationkey < 24
            ),
            e0 AS (
              SELECT 'n' || cast(a.k AS varchar) AS s,
                     'n' || cast(b.k AS varchar) AS d
              FROM nk a JOIN nk b
                ON a.k < b.k AND floor(a.k / 12) = floor(b.k / 12)
              UNION ALL
              SELECT 'n11', 'n12' FROM nk WHERE k = 11
            ),
            sym AS (
              SELECT s AS u, d AS v FROM e0 WHERE s <> d
              UNION
              SELECT d, s FROM e0 WHERE s <> d
            ),
            asg AS (
              SELECT 'n' || cast(k AS varchar) AS id,
                     cast(floor(k / 12) AS bigint) AS c
              FROM nk
            ),
            m2 AS (SELECT count(*) AS m FROM sym),
            lab AS (
              SELECT au.c AS cu, av.c AS cv
              FROM sym
              JOIN asg au ON sym.u = au.id
              JOIN asg av ON sym.v = av.id
            ),
            per_c AS (
              SELECT cu AS community,
                     cast(count(*) AS bigint) AS volume,
                     cast(sum(CASE WHEN cu <> cv THEN 1 ELSE 0 END)
                       AS bigint) AS cut
              FROM lab GROUP BY cu
            ),
            mem AS (
              SELECT c AS community, cast(count(*) AS bigint) AS n_members
              FROM asg GROUP BY c
            )
            SELECT mem.community, mem.n_members,
                   coalesce(per_c.cut, 0) AS cut,
                   coalesce(per_c.volume, 0) AS volume,
                   round(CASE WHEN least(per_c.volume,
                                         m2.m - per_c.volume) > 0
                         THEN coalesce(per_c.cut, 0)
                              / cast(least(per_c.volume,
                                           m2.m - per_c.volume) AS double)
                         ELSE 0.0 END, 9) AS conductance
            FROM mem LEFT JOIN per_c ON mem.community = per_c.community
            CROSS JOIN m2
        """,
        # Unigram KL: identical counts, smoothing, integer-product ln
        # arguments, round-6 after the sum (see q_corpus_kl).
        "corpus_kl": """
            WITH ta_ AS (
              SELECT unnest(regexp_extract_all(lower(text),
                       '[a-z0-9]{2,}')) AS term
              FROM documents WHERE source = 'src0'
            ),
            tb_ AS (
              SELECT unnest(regexp_extract_all(lower(text),
                       '[a-z0-9]{2,}')) AS term
              FROM documents
            ),
            ca AS (SELECT term, cast(count(*) AS bigint) AS ca
                   FROM ta_ GROUP BY term),
            cb AS (SELECT term, cast(count(*) AS bigint) AS cb
                   FROM tb_ GROUP BY term),
            m AS (
              SELECT coalesce(ca.term, cb.term) AS term,
                     coalesce(ca.ca, 0) AS ca, coalesce(cb.cb, 0) AS cb
              FROM ca FULL OUTER JOIN cb ON ca.term = cb.term
            ),
            s AS (SELECT cast(count(*) AS bigint) AS v,
                         cast(sum(ca) AS bigint) AS ta,
                         cast(sum(cb) AS bigint) AS tb
                  FROM m)
            SELECT s.v AS vocab_size, s.ta AS total_a, s.tb AS total_b,
                   round(sum(
                     ((m.ca + 1) / cast(s.ta + s.v AS double))
                     * ln(((m.ca + 1) * (s.tb + s.v))
                          / cast((m.cb + 1) * (s.ta + s.v) AS double))
                   ), 6) AS kl_divergence
            FROM m CROSS JOIN s
            GROUP BY 1, 2, 3
        """,
        # Cohort retention: identical epoch-day bucketing and keyed
        # min/join/distinct-count (see q_events_retention).
        "events_retention": """
            WITH b AS (
              SELECT user_id AS g,
                     epoch_us(ts) // 1000000 // 86400 AS w
              FROM events
              WHERE ts IS NOT NULL AND user_id IS NOT NULL
            ),
            f AS (SELECT g, min(w) AS cohort FROM b GROUP BY g)
            SELECT f.cohort, b.w - f.cohort AS periods_since,
                   cast(count(DISTINCT b.g) AS bigint) AS n_active
            FROM b JOIN f ON b.g = f.g
            GROUP BY 1, 2
        """,
        # Ordered funnel: identical chained min-after-previous-step
        # joins on epoch integers (see q_events_funnel).
        "events_funnel": """
            WITH b AS (
              SELECT user_id AS g, event_type AS s,
                     epoch_us(ts) // 1000000 AS e
              FROM events
              WHERE ts IS NOT NULL AND user_id IS NOT NULL
            ),
            r0 AS (SELECT g, min(e) AS t FROM b
                   WHERE s = 'signup' GROUP BY g),
            r1 AS (SELECT b.g, min(b.e) AS t FROM b JOIN r0 ON b.g = r0.g
                   WHERE b.s = 'purchase' AND b.e > r0.t GROUP BY b.g),
            r2 AS (SELECT b.g, min(b.e) AS t FROM b JOIN r1 ON b.g = r1.g
                   WHERE b.s = 'error' AND b.e > r1.t GROUP BY b.g),
            n AS (SELECT (SELECT count(*) FROM r0) AS n0,
                         (SELECT count(*) FROM r1) AS n1,
                         (SELECT count(*) FROM r2) AS n2)
            SELECT cast(0 AS int) AS step_idx, 'signup' AS step,
                   cast(n0 AS bigint) AS n_reached,
                   round(CASE WHEN n0 > 0 THEN cast(n0 AS double) / n0
                              ELSE 0.0 END, 6) AS conversion FROM n
            UNION ALL
            SELECT 1, 'purchase', cast(n1 AS bigint),
                   round(CASE WHEN n0 > 0 THEN cast(n1 AS double) / n0
                              ELSE 0.0 END, 6) FROM n
            UNION ALL
            SELECT 2, 'error', cast(n2 AS bigint),
                   round(CASE WHEN n0 > 0 THEN cast(n2 AS double) / n0
                              ELSE 0.0 END, 6) FROM n
        """,
        # Recency decay: identical epoch/age/pow arithmetic, round-6
        # after the per-key sum (see q_events_recency_decay).
        "events_recency_decay": """
            WITH n AS (
              SELECT max(epoch_us(ts) // 1000000) AS now
              FROM events
            )
            SELECT event_type,
                   cast(count(*) AS bigint) AS n_events,
                   round(sum(pow(cast(0.5 AS double),
                     ((n.now - epoch_us(ts) // 1000000) / 86400.0)
                     / cast(3.0 AS double))), 6) AS decayed_count,
                   cast(max(epoch_us(ts) // 1000000) AS bigint)
                     AS last_seen_epoch
            FROM events CROSS JOIN n
            WHERE ts IS NOT NULL
            GROUP BY event_type
        """,
        # Histogram-sketch quantiles: identical bucketing, integer
        # cumulative counts, and double rank arithmetic (q cast to
        # double — see q_events_hist_quantiles).
        "events_hist_quantiles": """
            WITH h AS (
              SELECT cast(least(greatest(
                       floor((value - 0.0) / 3.125), 0), 63) AS bigint)
                       AS bucket,
                     cast(count(*) AS bigint) AS n
              FROM events WHERE value IS NOT NULL GROUP BY 1
            ),
            c AS (
              SELECT bucket, n,
                     sum(n) OVER (ORDER BY bucket
                                  ROWS UNBOUNDED PRECEDING) AS cum,
                     sum(n) OVER () AS total
              FROM h
            )
            SELECT cast(0.5 AS double) AS q, value FROM (
              SELECT cast(bucket * cast(3.125 AS double) AS double) AS value,
                     row_number() OVER (ORDER BY bucket) AS rn
              FROM c WHERE cum >= ceil(cast(0.5 AS double) * total)
            ) WHERE rn = 1
            UNION ALL
            SELECT cast(0.95 AS double) AS q, value FROM (
              SELECT cast(bucket * cast(3.125 AS double) AS double) AS value,
                     row_number() OVER (ORDER BY bucket) AS rn
              FROM c WHERE cum >= ceil(cast(0.95 AS double) * total)
            ) WHERE rn = 1
        """,
        # Context-window assembly over the shared synthetic-transcripts
        # CTE: identical pair mining, range left join, DESC cumsum
        # budget cut, and ordered string_agg (NULL lines skipped —
        # matching collect_list's NULL skip).
        "sft_pairs_context": f"""
            WITH tr AS ({_SYNTH_TRANSCRIPTS_SQL}),
            g AS (
              SELECT conv_id, turn_idx, role, text,
                     lead(role) OVER w AS nrole,
                     lead(text) OVER w AS nresp
              FROM tr
              WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
            ),
            pairs AS (
              SELECT conv_id, turn_idx AS prompt_turn_idx, text AS prompt,
                     nresp AS response,
                     length(text) AS n_prompt_chars,
                     length(nresp) AS n_response_chars
              FROM g WHERE role = 'user' AND nrole = 'assistant'
            ),
            j AS (
              SELECT p.*, h.turn_idx AS ht,
                     h.role || ': ' || h.text AS line
              FROM pairs p LEFT JOIN tr h
                ON h.conv_id = p.conv_id
               AND h.turn_idx < p.prompt_turn_idx
            ),
            c AS (
              SELECT *,
                     sum(length(line) + 1) OVER (
                       PARTITION BY conv_id, prompt_turn_idx
                       ORDER BY ht DESC ROWS UNBOUNDED PRECEDING) AS csum
              FROM j
            ),
            ctx AS (
              SELECT conv_id, prompt_turn_idx, prompt, response,
                     n_prompt_chars, n_response_chars,
                     coalesce(string_agg(
                       CASE WHEN ht IS NOT NULL AND csum <= 120
                            THEN line END,
                       chr(10) ORDER BY ht), '') AS context
              FROM c GROUP BY 1, 2, 3, 4, 5, 6
            )
            SELECT conv_id, prompt_turn_idx, context, prompt, response,
                   length(context) AS n_context_chars,
                   n_prompt_chars, n_response_chars
            FROM ctx
        """,
        # Gap-splitting over the shared synthetic-transcripts CTE: the
        # identical lag + running-sum arithmetic on epoch integers.
        "transcript_sessionize": f"""
            WITH tr AS ({_SYNTH_TRANSCRIPTS_SQL}),
            g AS (
              SELECT conv_id, turn_idx,
                     epoch - lag(epoch) OVER (PARTITION BY conv_id
                                              ORDER BY turn_idx) AS gap
              FROM tr
            ),
            s AS (
              SELECT conv_id, turn_idx,
                     sum(CASE WHEN coalesce(gap, 0) > 40 THEN 1 ELSE 0 END)
                       OVER (PARTITION BY conv_id ORDER BY turn_idx
                             ROWS UNBOUNDED PRECEDING) AS session_idx
              FROM g
            )
            SELECT conv_id, turn_idx,
                   cast(session_idx AS bigint) AS session_idx,
                   conv_id || '#' || cast(session_idx AS varchar)
                     AS session_id
            FROM s
        """,
        # URL canonicalization — the url_normalize_expr chain mirrored
        # verbatim; DuckDB's empty-list array_to_string is NULL where
        # Spark's array_join is '', hence the coalesce.
        "url_normalize": r"""
            WITH raw AS (
              SELECT o_orderkey,
                     (CASE WHEN o_orderkey % 2 = 0 THEN 'HTTP://'
                           ELSE 'HTTPS://' END)
                     || 'Example' || cast(o_orderkey % 7 AS varchar)
                     || '.COM'
                     || (CASE o_orderkey % 4
                         WHEN 0 THEN ':80/a?utm_source=x&b=2&a=1'
                         WHEN 1 THEN ':443/A/B#frag'
                         WHEN 2 THEN ''
                         ELSE ':8080/x?gclid=1&z=9' END) AS u
              FROM orders
            ),
            parts AS (
              SELECT o_orderkey,
                lower(regexp_extract(trim(u),
                  '^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(\?[^#]*)?(#.*)?$', 1))
                  AS scheme,
                lower(regexp_extract(trim(u),
                  '^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(\?[^#]*)?(#.*)?$', 2))
                  AS host0,
                regexp_extract(trim(u),
                  '^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(\?[^#]*)?(#.*)?$', 3)
                  AS path0,
                regexp_extract(trim(u),
                  '^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(\?[^#]*)?(#.*)?$', 4)
                  AS query0
              FROM raw
            ),
            norm AS (
              SELECT o_orderkey, scheme,
                CASE WHEN scheme = 'http'
                       THEN regexp_replace(host0, ':80$', '')
                     WHEN scheme = 'https'
                       THEN regexp_replace(host0, ':443$', '')
                     ELSE host0 END AS host,
                CASE WHEN path0 = '' THEN '/' ELSE path0 END AS path,
                coalesce(array_to_string(list_sort(list_filter(
                  string_split(regexp_replace(query0, '^\?', ''), '&'),
                  p -> p <> '' AND NOT regexp_matches(p,
                         '^(utm_|fbclid=|gclid=|msclkid=)'))), '&'), '')
                  AS qnorm
              FROM parts
            )
            SELECT o_orderkey,
                   CASE WHEN scheme = '' THEN NULL
                        ELSE scheme || '://' || host || path
                             || (CASE WHEN qnorm = '' THEN ''
                                      ELSE '?' || qnorm END)
                   END AS url_norm
            FROM norm
        """,
        # From-scratch closure over the UNION of both batches — the
        # incremental merge must land on the identical min-id labeling
        # (see q_graph_cc_increment).
        "graph_cc_increment": """
            WITH RECURSIVE
            ks AS (SELECT o_orderkey AS k FROM orders WHERE o_orderkey % 19 = 0),
            e AS (
              SELECT 7 * k + i.i AS s, 7 * k + i.i + 1 AS d
              FROM ks CROSS JOIN (SELECT unnest(range(5)) AS i) i
            ),
            sym AS (SELECT s, d FROM e UNION SELECT d, s FROM e),
            nodes AS (SELECT DISTINCT s AS id FROM sym),
            reach(id, r) AS (
              SELECT id, id FROM nodes
              UNION
              SELECT reach.id, sym.d FROM reach JOIN sym ON reach.r = sym.s
            )
            SELECT cast(id AS bigint) AS id,
                   cast(min(r) AS bigint) AS component
            FROM reach GROUP BY id
        """,
        # Local clustering coefficient over the 3-clique + pendant
        # gadgets: independent triangle join + degree count, round-6
        # division, deg < 2 pinned to 0.0 (see q_graph_lcc).
        "graph_lcc": """
            WITH ks AS (SELECT o_orderkey AS k FROM orders WHERE o_orderkey % 13 = 0),
            e0 AS (
              SELECT 3 * k AS s, 3 * k + 1 AS d FROM ks
              UNION ALL SELECT 3 * k + 1, 3 * k + 2 FROM ks
              UNION ALL SELECT 3 * k, 3 * k + 2 FROM ks
              UNION ALL SELECT 3 * k + 2, 3 * k + 3 FROM ks
            ),
            e AS (SELECT DISTINCT least(s, d) AS a, greatest(s, d) AS b
                  FROM e0 WHERE s <> d),
            tri AS (
              SELECT e1.a AS x, e1.b AS y, e2.b AS z
              FROM e e1
              JOIN e e2 ON e1.b = e2.a
              JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
            ),
            corners AS (
              SELECT x AS id FROM tri
              UNION ALL SELECT y FROM tri
              UNION ALL SELECT z FROM tri
            ),
            tc AS (SELECT id, count(*) AS cnt FROM corners GROUP BY id),
            deg AS (
              SELECT id, count(*) AS degree FROM (
                SELECT a AS id FROM e UNION ALL SELECT b FROM e
              ) GROUP BY id
            ),
            nodes AS (SELECT s AS id FROM e0 UNION SELECT d AS id FROM e0)
            SELECT cast(n.id AS bigint) AS id,
                   cast(coalesce(deg.degree, 0) AS bigint) AS degree,
                   round(CASE WHEN coalesce(deg.degree, 0) >= 2
                         THEN 2.0 * coalesce(tc.cnt, 0)
                              / (deg.degree * (deg.degree - 1))
                         ELSE 0.0 END, 6) AS lcc
            FROM nodes n
            LEFT JOIN deg ON deg.id = n.id
            LEFT JOIN tc ON tc.id = n.id
        """,
        # CUSUM level shift: the same prefix identity (cumsum minus
        # running min, floored at 0) in pure-integer window arithmetic
        # (see q_events_cusum).
        "events_cusum": """
            WITH c AS (
              SELECT event_type AS grp, date_trunc('hour', ts) AS bucket,
                     cast(count(*) AS bigint) AS x
              FROM events GROUP BY 1, 2
            ),
            t AS (
              SELECT grp, cast(count(*) AS bigint) AS n_buckets,
                     cast(sum(x) AS bigint) AS total
              FROM c GROUP BY grp
            ),
            j AS (
              SELECT c.grp, c.bucket, c.x, t.total,
                     cast(sum(t.n_buckets * c.x - t.total) OVER (
                       PARTITION BY c.grp ORDER BY c.bucket
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                     ) AS bigint) AS cs
              FROM c JOIN t USING (grp)
            ),
            m AS (
              SELECT grp, bucket, x, total, cs,
                     min(cs) OVER (
                       PARTITION BY grp ORDER BY bucket
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                     ) AS mincs
              FROM j
            )
            SELECT grp AS event_type, bucket, x,
                   cast(cs - least(0, mincs) AS bigint) AS cusum_scaled,
                   (cs - least(0, mincs)) > 3 * total AS alarm
            FROM m
        """,
        # BM25: identical float expression shape per (doc, term),
        # round-6 after the per-doc sum, (score DESC, id ASC) rank
        # (see q_text_bm25_search).
        "text_bm25_search": _bm25_oracle_sql(["merge", "stream", "vector"]),
        # RRF fusion of two BM25 rankers: 1/(60+rank) contributions,
        # round-6 after the per-doc sum, fused (score DESC, id ASC)
        # rank (see q_search_rrf). Each ranker nests the shared BM25
        # oracle as a derived table.
        "search_rrf": f"""
            WITH u AS (
              SELECT doc_id, 1.0 / (60 + rk) AS c
              FROM ({_bm25_oracle_sql(["merge", "stream", "vector"])})
              UNION ALL
              SELECT doc_id, 1.0 / (60 + rk) AS c
              FROM ({_bm25_oracle_sql(["slow", "error"])})
            ),
            fused AS (
              SELECT doc_id, round(sum(c), 6) AS score
              FROM u GROUP BY doc_id
            )
            SELECT doc_id, score, cast(rk AS int) AS rk FROM (
              SELECT *, row_number() OVER (
                ORDER BY score DESC, doc_id ASC
              ) AS rk FROM fused
            ) WHERE rk <= 20
        """,
        # Type-token ratio: same [a-z0-9]{{2,}} token class as the
        # TF-IDF/BM25 family, one round-6 division (see q_text_ttr).
        "text_ttr": """
            SELECT doc_id,
                   cast(len(regexp_extract_all(lower(text), '[a-z0-9]{2,}'))
                     AS int) AS n_tokens,
                   cast(len(list_distinct(
                     regexp_extract_all(lower(text), '[a-z0-9]{2,}')))
                     AS int) AS n_types,
                   round(len(list_distinct(
                       regexp_extract_all(lower(text), '[a-z0-9]{2,}')))
                     / len(regexp_extract_all(lower(text), '[a-z0-9]{2,}')),
                     6) AS ttr
            FROM documents
        """,
        # Fano burstiness: exact-integer numerator/denominator, one
        # identical division per group (see q_events_burstiness).
        "events_burstiness": """
            WITH c AS (
              SELECT event_type AS grp, date_trunc('hour', ts) AS bucket,
                     cast(count(*) AS bigint) AS x
              FROM events GROUP BY 1, 2
            ),
            a AS (
              SELECT grp, cast(count(*) AS bigint) AS n,
                     cast(sum(x) AS bigint) AS s1,
                     cast(sum(x * x) AS bigint) AS s2
              FROM c GROUP BY grp
            )
            SELECT grp AS event_type, n AS n_buckets,
                   round((n * s2 - s1 * s1) / (n * s1), 6) AS fano
            FROM a
        """,
        "events_dormancy": """
            WITH e AS (
              SELECT DISTINCT
                     event_type || '#' || cast(user_id % 29 AS varchar) AS ind,
                     epoch_us(ts) AS us
              FROM events WHERE ts IS NOT NULL
            ),
            g AS (
              SELECT ind, us,
                     us - lag(us) OVER (PARTITION BY ind ORDER BY us) AS gap
              FROM e
            ),
            a AS (
              SELECT ind,
                     cast(count(*) AS bigint) AS n_sightings,
                     cast(sum(CASE WHEN gap > 200000000000 THEN 1 ELSE 0 END)
                          AS bigint) AS n_reactivations,
                     max(gap) AS max_gap,
                     arg_max(gap, us) AS last_gap
              FROM g GROUP BY ind
            )
            SELECT ind, n_sightings, n_reactivations,
                   round(max_gap / cast(1000000 AS double), 6) AS max_quiet_s,
                   round(last_gap / cast(1000000 AS double), 6) AS last_quiet_s,
                   coalesce(last_gap > 200000000000, false) AS reactivated
            FROM a
        """,
        # Set churn: period folded into the (group, bucket) join key,
        # exact integer set sizes, one round-6 division each (see
        # q_events_churn).
        "events_churn": """
            WITH gb AS (
              SELECT DISTINCT user_id || '|' || event_type AS g,
                     cast((epoch_us(ts) // 1000000) // 86400 AS bigint) AS w
              FROM events WHERE ts IS NOT NULL
            ),
            s AS (SELECT w, cast(count(*) AS bigint) AS n FROM gb GROUP BY w),
            com AS (
              SELECT a.w, cast(count(*) AS bigint) AS n_common
              FROM gb a JOIN gb b ON a.g = b.g AND b.w = a.w - 1
              GROUP BY a.w
            )
            SELECT cur.w AS bucket, cur.n AS n_cur, prv.n AS n_prev,
                   cast(coalesce(com.n_common, 0) AS bigint) AS n_common,
                   round(coalesce(com.n_common, 0)
                         / (cur.n + prv.n - coalesce(com.n_common, 0)), 6)
                     AS jaccard,
                   round(1 - coalesce(com.n_common, 0)
                         / (cur.n + prv.n - coalesce(com.n_common, 0)), 6)
                     AS churn
            FROM s cur
            JOIN s prv ON prv.w = cur.w - 1
            LEFT JOIN com ON com.w = cur.w
        """,
        # Autocorrelation: lag folded into the (group, hour) join key,
        # paired-sample integer Pearson identity (see q_events_autocorr).
        "events_autocorr": """
            WITH c AS (
              SELECT event_type AS g,
                     cast(epoch_us(date_trunc('hour', ts)) // 3600000000
                          AS bigint) AS h,
                     cast(count(*) AS bigint) AS x
              FROM events GROUP BY 1, 2
            ),
            p AS (
              SELECT a.g, a.x AS x, b.x AS y
              FROM c a JOIN c b ON a.g = b.g AND b.h = a.h + 24
            ),
            a AS (
              SELECT g, cast(count(*) AS bigint) AS n,
                     cast(sum(x) AS bigint) AS sx,
                     cast(sum(y) AS bigint) AS sy,
                     cast(sum(x * x) AS bigint) AS sx2,
                     cast(sum(y * y) AS bigint) AS sy2,
                     cast(sum(x * y) AS bigint) AS sxy
              FROM p GROUP BY g HAVING count(*) >= 3
            )
            SELECT g AS event_type, n AS n_pairs,
                   cast(sign(n * sxy - sx * sy) AS int) AS direction,
                   round(((n * sxy - sx * sy) * (n * sxy - sx * sy))
                         / ((n * sx2 - sx * sx) * (n * sy2 - sy * sy)),
                         6) AS r2
            FROM a
            WHERE n * sx2 - sx * sx > 0 AND n * sy2 - sy * sy > 0
        """,
        # Novelty curve: epoch-integer day buckets, first-seen min,
        # bucket-keyed counts, one round-6 division (see
        # q_events_novelty).
        "events_novelty": """
            WITH gb AS (
              SELECT DISTINCT user_id || '|' || event_type AS g,
                     cast((epoch_us(ts) // 1000000) // 86400 AS bigint) AS w
              FROM events WHERE ts IS NOT NULL
            ),
            act AS (
              SELECT w, cast(count(*) AS bigint) AS n_active FROM gb GROUP BY w
            ),
            fs AS (SELECT g, min(w) AS w FROM gb GROUP BY g),
            nw AS (
              SELECT w, cast(count(*) AS bigint) AS n_new FROM fs GROUP BY w
            )
            SELECT act.w AS bucket,
                   cast(coalesce(nw.n_new, 0) AS bigint) AS n_new,
                   act.n_active,
                   round(coalesce(nw.n_new, 0) / act.n_active, 6) AS pct_new
            FROM act LEFT JOIN nw ON act.w = nw.w
        """,
        # Trend slope: rebased integer hour index, exact-integer LSQ
        # identity, one round-6 division (see q_events_trend).
        "events_trend": """
            WITH c AS (
              SELECT event_type AS g,
                     cast(epoch_us(date_trunc('hour', ts)) // 3600000000
                          AS bigint) AS h,
                     cast(count(*) AS bigint) AS y
              FROM events GROUP BY 1, 2
            ),
            b AS (SELECT cast(min(h) AS bigint) AS h0 FROM c),
            r AS (SELECT g, h - h0 AS t, y FROM c CROSS JOIN b),
            a AS (
              SELECT g, cast(count(*) AS bigint) AS n,
                     cast(sum(t) AS bigint) AS st,
                     cast(sum(t * t) AS bigint) AS st2,
                     cast(sum(y) AS bigint) AS sy,
                     cast(sum(t * y) AS bigint) AS sty
              FROM r GROUP BY g
            )
            SELECT g AS event_type, n AS n_buckets,
                   cast(sign(n * sty - st * sy) AS int) AS direction,
                   round((n * sty - st * sy) / (n * st2 - st * st), 6) AS slope
            FROM a WHERE n * st2 - st * st > 0
        """,
        # Temporal correlation: exact-integer Pearson identity over the
        # common hourly bucket universe, sign separate, one round-6
        # division (see q_events_correlation).
        "events_correlation": """
            WITH c AS (
              SELECT event_type AS g, date_trunc('hour', ts) AS bucket,
                     cast(count(*) AS bigint) AS x
              FROM events GROUP BY 1, 2
            ),
            nb AS (SELECT cast(count(DISTINCT bucket) AS bigint) AS n FROM c),
            m AS (
              SELECT g, cast(sum(x) AS bigint) AS s1,
                     cast(sum(x * x) AS bigint) AS s2
              FROM c GROUP BY g
            ),
            xy AS (
              SELECT ca.g AS a, cb.g AS b,
                     cast(sum(ca.x * cb.x) AS bigint) AS sxy,
                     cast(count(*) AS bigint) AS ns
              FROM c ca JOIN c cb ON ca.bucket = cb.bucket AND ca.g < cb.g
              GROUP BY 1, 2 HAVING count(*) >= 3
            )
            SELECT xy.a, xy.b, xy.ns AS n_shared,
                   cast(sign(nb.n * xy.sxy - ma.s1 * mb.s1) AS int) AS direction,
                   round(((nb.n * xy.sxy - ma.s1 * mb.s1)
                          * (nb.n * xy.sxy - ma.s1 * mb.s1))
                         / ((nb.n * ma.s2 - ma.s1 * ma.s1)
                            * (nb.n * mb.s2 - mb.s1 * mb.s1)), 6) AS r2
            FROM xy
            CROSS JOIN nb
            JOIN m ma ON ma.g = xy.a
            JOIN m mb ON mb.g = xy.b
            WHERE nb.n * ma.s2 - ma.s1 * ma.s1 > 0
              AND nb.n * mb.s2 - mb.s1 * mb.s1 > 0
        """,
        # Shannon entropy: every ln argument an exact integer count via
        # H = ln n − (Σ c·ln c)/n; round-6 after the sum (see
        # q_events_entropy).
        "events_entropy": """
            WITH c AS (
              SELECT user_id AS grp, event_type AS state,
                     cast(count(*) AS bigint) AS c
              FROM events GROUP BY 1, 2
            ),
            a AS (
              SELECT grp, cast(count(*) AS bigint) AS k,
                     cast(sum(c) AS bigint) AS n,
                     sum(c * ln(c)) AS sclogc
              FROM c GROUP BY grp
            )
            SELECT grp AS user_id, n AS n_events, k AS n_states,
                   round(ln(n) - sclogc / n, 6) AS entropy
            FROM a
        """,
        # Reciprocity: identical gadget construction, distinct/self-loop
        # conventions, EXISTS mutual test, one round-6 division (see
        # q_graph_reciprocity).
        "graph_reciprocity": """
            WITH g AS (
              SELECT o_orderkey * 4 AS k4, o_orderkey % 2 = 0 AS ev
              FROM orders WHERE o_orderkey % 11 = 0
            ),
            raw AS (
              SELECT k4 + 0 AS src, k4 + 1 AS dst FROM g
              UNION ALL SELECT k4 + 0, k4 + 1 FROM g
              UNION ALL SELECT k4 + 1, k4 + 0 FROM g WHERE ev
              UNION ALL SELECT k4 + 0, k4 + 2 FROM g
              UNION ALL SELECT k4 + 2, k4 + 2 FROM g
            ),
            e AS (
              SELECT DISTINCT src AS a, dst AS b FROM raw WHERE src <> dst
            ),
            m AS (
              SELECT count(*) AS n_mutual FROM e
              WHERE EXISTS (SELECT 1 FROM e r WHERE r.a = e.b AND r.b = e.a)
            ),
            n AS (SELECT count(*) AS n_directed FROM e)
            SELECT cast(n_directed AS bigint) AS n_directed,
                   cast(n_mutual AS bigint) AS n_mutual,
                   CASE WHEN n_directed > 0
                        THEN round(n_mutual / n_directed, 6) END AS reciprocity
            FROM n, m
        """,
        # Event-sequence trigrams: (ts, id) total order, exact counts,
        # rank after the deterministic top-k cut (see
        # q_events_top_sequences).
        "events_top_sequences": """
            WITH s AS (
              SELECT concat_ws(' > ',
                       lag(event_type, 2) OVER w,
                       lag(event_type, 1) OVER w,
                       event_type) AS pattern,
                     lag(event_type, 2) OVER w AS f
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ),
            c AS (
              SELECT pattern, cast(count(*) AS bigint) AS n
              FROM s WHERE f IS NOT NULL GROUP BY pattern
            ),
            t AS (SELECT * FROM c ORDER BY n DESC, pattern ASC LIMIT 20)
            SELECT pattern, n,
                   cast(row_number() OVER (ORDER BY n DESC, pattern ASC) AS int) AS rk
            FROM t
        """,
        # Gini concentration: integer ranks over (count, source)-sorted
        # totals, exact-integer rank formula, one round-6 division (see
        # q_corpus_source_gini).
        "corpus_source_gini": """
            WITH t AS (
              SELECT source AS grp, cast(sum(n_chars) AS bigint) AS x
              FROM documents GROUP BY source
            ),
            r AS (
              SELECT x, cast(row_number() OVER (ORDER BY x, grp) AS bigint) AS i
              FROM t
            ),
            a AS (
              SELECT cast(count(*) AS bigint) AS n,
                     cast(sum(x) AS bigint) AS t,
                     cast(sum((2 * i - 1) * x) AS bigint) AS s
              FROM r
            )
            SELECT n AS n_groups, t AS total,
                   round((s - n * t) / (n * t), 6) AS gini
            FROM a
        """,
        # Beacon regularity: epoch-integer gaps over the (ts, id) total
        # order, cv² = (n·Σg² − (Σg)²)/(Σg)² exact-integer identity,
        # one round-6 division per channel (see q_events_beacons).
        "events_beacons": """
            WITH e AS (
              SELECT user_id AS grp, event_type AS state, ts, event_id,
                     cast(epoch_us(ts) // 1000000 AS bigint) AS ep
              FROM events
            ),
            g AS (
              SELECT grp, state,
                     ep - lag(ep) OVER (
                       PARTITION BY grp, state ORDER BY ts, event_id
                     ) AS g
              FROM e
            ),
            a AS (
              SELECT grp, state, cast(count(*) AS bigint) AS n,
                     cast(sum(g) AS bigint) AS s1,
                     cast(sum(g * g) AS bigint) AS s2
              FROM g WHERE g IS NOT NULL GROUP BY grp, state
            )
            SELECT grp AS user_id, state AS event_type,
                   cast(n + 1 AS bigint) AS n_events,
                   round(s1 / n, 6) AS mean_gap_s,
                   CASE WHEN s1 > 0
                        THEN round((n * s2 - s1 * s1) / (s1 * s1), 6)
                   END AS cv2
            FROM a WHERE n >= 3
        """,
        # Markov transitions: identical (ts, id) sequence order, exact
        # integer counts, one round-6 division (see q_events_markov).
        "events_markov": """
            WITH p AS (
              SELECT lag(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                     ) AS src_state,
                     event_type AS dst_state
              FROM events
            ),
            c AS (
              SELECT src_state, dst_state, cast(count(*) AS bigint) AS n
              FROM p WHERE src_state IS NOT NULL GROUP BY 1, 2
            ),
            m AS (
              SELECT src_state, cast(sum(n) AS bigint) AS total
              FROM c GROUP BY 1
            )
            SELECT c.src_state, c.dst_state, c.n,
                   round(c.n / m.total, 6) AS prob
            FROM c JOIN m USING (src_state)
        """,
        # Top bigrams: same token class, (n DESC, ngram ASC) rank
        # (see q_corpus_top_ngrams).
        "corpus_top_ngrams": """
            WITH toks AS (
              SELECT regexp_extract_all(lower(text), '[a-z0-9]{2,}') AS t
              FROM documents
            ),
            g AS (
              SELECT unnest(
                CASE WHEN len(t) >= 2
                  THEN list_transform(generate_series(1, len(t) - 1),
                                      i -> t[i] || ' ' || t[i + 1])
                  ELSE [] END) AS ngram
              FROM toks
            ),
            c AS (SELECT ngram, cast(count(*) AS bigint) AS n FROM g GROUP BY 1)
            SELECT ngram, n, cast(rk AS int) AS rk FROM (
              SELECT *, row_number() OVER (ORDER BY n DESC, ngram ASC) AS rk
              FROM c
            ) WHERE rk <= 20
        """,
        # df-band vocabulary: per-doc distinct terms, exact df counts,
        # floor(ratio*N) bound (see q_vocab_prune).
        "vocab_prune": """
            WITH per_doc AS (
              SELECT doc_id,
                     unnest(list_distinct(
                       regexp_extract_all(lower(text), '[a-z0-9]{2,}')))
                       AS term
              FROM documents
            ),
            dfreq AS (
              SELECT term, cast(count(*) AS bigint) AS df
              FROM per_doc GROUP BY term
            ),
            n AS (SELECT cast(count(*) AS bigint) AS n FROM documents)
            SELECT term, df
            FROM dfreq CROSS JOIN n
            WHERE df >= 30 AND df <= floor(0.77 * n)
        """,
        # Heaps'-law growth: per-source token sums + distinct types,
        # one round-6 division (see q_vocab_growth).
        "vocab_growth": """
            WITH base AS (
              SELECT source AS grp,
                     regexp_extract_all(lower(text), '[a-z0-9]{2,}') AS toks
              FROM documents
            ),
            sums AS (
              SELECT grp, cast(sum(len(toks)) AS bigint) AS n_tokens
              FROM base GROUP BY grp
            ),
            types AS (
              SELECT grp, cast(count(*) AS bigint) AS n_types FROM (
                SELECT DISTINCT grp, unnest(toks) AS term FROM base
              ) GROUP BY grp
            )
            SELECT sums.grp AS source, sums.n_tokens, types.n_types,
                   round(types.n_types / sums.n_tokens, 6)
                     AS type_token_ratio
            FROM sums JOIN types USING (grp)
        """,
        # Blocklist gate: exact whole-token hits over the same \\s+
        # split, round-6 ratio, strict > flag (see q_text_blocklist).
        "text_blocklist": r"""
            WITH h AS (
              SELECT doc_id,
                     cast(len(list_filter(
                       regexp_split_to_array(trim(lower(text)), '\s+'),
                       x -> list_contains(['dup', 'error', 'slow'], x)
                     )) AS int) AS bad_hits,
                     len(regexp_split_to_array(trim(lower(text)), '\s+'))
                       AS n_tokens
              FROM documents
            )
            SELECT doc_id, bad_hits,
                   round(bad_hits / n_tokens, 6) AS bad_ratio,
                   round(bad_hits / n_tokens, 6) > 0.06 AS blocked
            FROM h
        """,
        # BPE merge training / application: unrolled 6-step recurrence
        # (see q_bpe_train / q_bpe_token_counts / operators/bpe.py).
        "bpe_train": _bpe_train_oracle_sql(6),
        "bpe_token_counts": _bpe_token_counts_oracle_sql(6),
        "dedup_paragraphs": """
            WITH d AS (
              SELECT cast(doc_id AS bigint) AS doc_id,
                     concat_ws(chr(10), text, 'COOKIE NOTICE accept all',
                       CASE WHEN doc_id % 3 = 0
                            THEN 'SUBSCRIBE to our newsletter' END) AS text
              FROM documents
            ),
            p AS (
              SELECT doc_id,
                     unnest(string_split(text, chr(10))) AS para,
                     generate_subscripts(string_split(text, chr(10)), 1)
                       AS pos
              FROM d
            ),
            boiler AS (
              SELECT para FROM p GROUP BY para
              HAVING count(DISTINCT doc_id) >= 2
            ),
            kept AS (SELECT p.* FROM p ANTI JOIN boiler USING (para)),
            tot AS (
              SELECT doc_id, count(*) AS n_paragraphs FROM p GROUP BY 1
            ),
            reb AS (
              SELECT doc_id,
                     string_agg(para, chr(10) ORDER BY pos) AS text,
                     count(*) AS n_kept
              FROM kept GROUP BY 1
            )
            SELECT t.doc_id,
                   coalesce(r.text, '') AS text,
                   cast(t.n_paragraphs AS bigint) AS n_paragraphs,
                   cast(t.n_paragraphs - coalesce(r.n_kept, 0) AS bigint)
                     AS n_removed
            FROM tot t LEFT JOIN reb r USING (doc_id)
        """,
        "er_sorted_neighborhood": """
            -- literal Hernandez-Stolfo window over the global order;
            -- the Spark side reaches the same ranks via sampled-
            -- boundary bucketing + prefix offsets (TeraSort rank).
            WITH r AS (
              SELECT cast(c_custkey AS bigint) AS id,
                     reverse(c_name) AS key,
                     row_number()
                       OVER (ORDER BY reverse(c_name), c_custkey) AS rk
              FROM customer
            )
            SELECT a.id AS id_a, b.id AS id_b,
                   a.key AS key_a, b.key AS key_b,
                   cast(b.rk - a.rk AS bigint) AS rank_distance
            FROM r a JOIN r b
              ON b.rk > a.rk AND b.rk - a.rk < 5
        """,
        "kg_schema_audit": _schema_audit_oracle_sql(),
        "kg_scd2_intervals": """
            WITH obs AS (
              SELECT 'Domain_' || cast(user_id % 40 AS varchar) AS subj,
                     'RESOLVES_TO' AS pred,
                     'Ipv4_' || cast(event_id % 7 AS varchar) AS obj,
                     ts
              FROM events
            ),
            flagged AS (
              SELECT subj, pred, obj, ts,
                     CASE WHEN lag(obj) OVER w IS NOT DISTINCT FROM obj
                          THEN 0 ELSE 1 END AS chg
              FROM obs
              WINDOW w AS (PARTITION BY subj, pred ORDER BY ts, obj)
            ),
            runs0 AS (
              SELECT subj, pred, obj, ts,
                     sum(chg) OVER (
                       PARTITION BY subj, pred ORDER BY ts, obj
                       ROWS UNBOUNDED PRECEDING) AS run
              FROM flagged
            ),
            runs AS (
              SELECT subj, pred, run, obj, min(ts) AS valid_from,
                     cast(count(*) AS bigint) AS n_observations
              FROM runs0 GROUP BY 1, 2, 3, 4
            )
            SELECT subj, pred, obj, valid_from,
                   lead(valid_from) OVER w2 AS valid_to,
                   n_observations,
                   (lead(valid_from) OVER w2 IS NULL) AS is_current
            FROM runs
            WINDOW w2 AS (
              PARTITION BY subj, pred ORDER BY valid_from, obj)
        """,
        "er_verified_matches": """
            -- blocking (literal sorted-neighborhood window) + verify
            -- (normalized Levenshtein), the Spark side's TeraSort-rank
            -- bucketing reaching identical ranks.
            WITH r AS (
              SELECT cast(p_partkey AS bigint) AS id, p_name AS key,
                     row_number() OVER (ORDER BY p_name, p_partkey)
                       AS rk
              FROM part
            ),
            cand AS (
              SELECT a.id AS id_a, b.id AS id_b,
                     a.key AS key_a, b.key AS key_b
              FROM r a JOIN r b
                ON b.rk > a.rk AND b.rk - a.rk < 4
            ),
            scored AS (
              SELECT id_a, id_b, key_a, key_b,
                     round(CASE
                       WHEN greatest(length(key_a), length(key_b)) = 0
                         THEN 1.0
                       ELSE 1.0 - levenshtein(key_a, key_b)
                              / greatest(length(key_a), length(key_b))
                     END, 6) AS similarity
              FROM cand
            )
            SELECT * FROM scored WHERE similarity >= 0.45
        """,
        "kg_temporal_two_hop": """
            WITH e AS (
              SELECT 'N' || cast(event_id % 199 AS varchar) AS src,
                     'N' || cast((event_id * 7 + 1) % 199 AS varchar)
                       AS dst,
                     ts, epoch_us(ts) AS tu
              FROM events WHERE event_id % 3 = 0
            )
            SELECT a.src AS a, a.dst AS b, b.dst AS c,
                   a.ts AS t1, b.ts AS t2,
                   (b.tu - a.tu) / 1000000.0 AS gap_s
            FROM e a JOIN e b
              ON a.dst = b.src
             AND b.tu > a.tu
             AND b.tu - a.tu <= 3 * 86400 * 1000000::bigint
        """,
        "kg_corroboration": """
            SELECT 'part_' || cast(l_partkey AS varchar) AS subj,
                   'SUPPLIED_BY' AS pred,
                   'supp_' || cast(l_suppkey AS varchar) AS obj,
                   cast(count(DISTINCT 'feed_' ||
                        cast(l_orderkey % 13 AS varchar)) AS bigint)
                     AS n_sources,
                   cast(count(*) AS bigint) AS n_mentions,
                   round(1.0 - power(0.3,
                     count(DISTINCT l_orderkey % 13)), 6) AS confidence
            FROM lineitem
            GROUP BY 1, 2, 3
        """,
        # Exact tie-aware ROC-AUC: identical synthetic scorer, the same
        # distinct-score-group cumulative-count rank identity
        # (2·avg-rank of a tied group = 2·cnt_lt + n + 1), exact
        # integers until ONE round-6 division (see q_eval_roc_auc).
        "eval_roc_auc": """
            WITH s AS (
              SELECT md5_number_upper('auc_s:' || cast(doc_id AS varchar))
                       % 1000 AS th,
                     md5_number_upper('auc_y:' || cast(doc_id AS varchar))
                       % 1000000 AS yb
              FROM documents
            ),
            r AS (
              SELECT cast(round((cast(th AS double) / 1000.0) * 1000000)
                       AS bigint) AS m,
                     CASE WHEN yb < th * 1000 THEN 1 ELSE 0 END AS y
              FROM s
            ),
            g AS (SELECT m, count(*) AS n, sum(y) AS np FROM r GROUP BY m),
            c AS (
              SELECT m, n, np,
                     sum(n) OVER (ORDER BY m ROWS BETWEEN UNBOUNDED
                       PRECEDING AND CURRENT ROW) - n AS lt
              FROM g
            ),
            t AS (
              SELECT sum(np * (2 * lt + n + 1)) AS s2,
                     sum(np) AS n_pos, sum(n) - sum(np) AS n_neg
              FROM c
            )
            SELECT cast(n_pos AS bigint) AS n_pos,
                   cast(n_neg AS bigint) AS n_neg,
                   round(cast(s2 - n_pos * (n_pos + 1) AS double)
                         / cast(2 * n_pos * n_neg AS double), 6) AS auc
            FROM t
        """,
        # PR operating-point table: identical bucket floor + descending
        # cumulation, exact TP/FP/FN integers (see q_eval_pr_curve).
        "eval_pr_curve": """
            WITH s AS (
              SELECT md5_number_upper('auc_s:' || cast(doc_id AS varchar))
                       % 1000 AS th,
                     md5_number_upper('auc_y:' || cast(doc_id AS varchar))
                       % 1000000 AS yb
              FROM documents
            ),
            r AS (
              SELECT cast(round((cast(th AS double) / 1000.0) * 1000000)
                       AS bigint) AS m,
                     CASE WHEN yb < th * 1000 THEN 1 ELSE 0 END AS y
              FROM s
            ),
            b AS (
              SELECT least((m * 10) // 1000000, 9) AS bucket, y FROM r
            ),
            agg0 AS (
              SELECT bucket, count(*) AS n, sum(y) AS np
              FROM b GROUP BY bucket
            ),
            per AS (
              -- dense threshold spine, mirroring the operator
              SELECT s.bucket, coalesce(a.n, 0) AS n,
                     coalesce(a.np, 0) AS np
              FROM (SELECT unnest(generate_series(0, 9)) AS bucket) s
              LEFT JOIN agg0 a USING (bucket)
            ),
            c AS (
              SELECT bucket,
                     sum(np) OVER wd AS tp,
                     sum(n) OVER wd - sum(np) OVER wd AS fp,
                     sum(np) OVER () - sum(np) OVER wd AS fn
              FROM per
              WINDOW wd AS (ORDER BY bucket DESC ROWS BETWEEN UNBOUNDED
                            PRECEDING AND CURRENT ROW)
            )
            SELECT round(cast(bucket AS double) / 10.0, 6) AS threshold,
                   cast(tp AS bigint) AS tp,
                   cast(fp AS bigint) AS fp,
                   cast(fn AS bigint) AS fn,
                   CASE WHEN tp + fp <> 0 THEN
                     round(cast(tp AS double) / cast(tp + fp AS double), 6)
                   END AS precision,
                   CASE WHEN tp + fn <> 0 THEN
                     round(cast(tp AS double) / cast(tp + fn AS double), 6)
                   END AS recall,
                   CASE WHEN 2 * tp + fp + fn <> 0 THEN
                     round(cast(2 * tp AS double)
                           / cast(2 * tp + fp + fn AS double), 6)
                   END AS f1
            FROM c
        """,
        # Dyadic EWMA: integer hourly counts over powers of two are
        # exactly representable, so the UNROUNDED ewma column hashes
        # identically; row-based lags over present buckets only
        # (see q_events_ewma_hourly).
        "events_ewma_hourly": """
            WITH b AS (
              SELECT event_type AS g,
                     epoch_us(ts) // 1000000 // 3600 AS bucket
              FROM events
              WHERE ts IS NOT NULL AND event_type IS NOT NULL
            ),
            c AS (
              SELECT g, bucket, count(*) AS cnt
              FROM b GROUP BY g, bucket
            )
            SELECT g AS event_type, cast(bucket AS bigint) AS bucket,
                   cast(cnt AS bigint) AS cnt,
                   cast(cnt AS double) / 2.0
                   + coalesce(cast(lag(cnt, 1) OVER w AS double), 0.0) / 4.0
                   + coalesce(cast(lag(cnt, 2) OVER w AS double), 0.0) / 8.0
                   + coalesce(cast(lag(cnt, 3) OVER w AS double), 0.0) / 16.0
                   + coalesce(cast(lag(cnt, 4) OVER w AS double), 0.0) / 32.0
                   + coalesce(cast(lag(cnt, 5) OVER w AS double), 0.0) / 64.0
                   + coalesce(cast(lag(cnt, 6) OVER w AS double), 0.0) / 128.0
                   + coalesce(cast(lag(cnt, 7) OVER w AS double), 0.0) / 256.0
                     AS ewma,
                   round(cast(cnt AS double) / (
                     cast(cnt AS double) / 2.0
                     + coalesce(cast(lag(cnt, 1) OVER w AS double), 0.0) / 4.0
                     + coalesce(cast(lag(cnt, 2) OVER w AS double), 0.0) / 8.0
                     + coalesce(cast(lag(cnt, 3) OVER w AS double), 0.0) / 16.0
                     + coalesce(cast(lag(cnt, 4) OVER w AS double), 0.0) / 32.0
                     + coalesce(cast(lag(cnt, 5) OVER w AS double), 0.0) / 64.0
                     + coalesce(cast(lag(cnt, 6) OVER w AS double), 0.0) / 128.0
                     + coalesce(cast(lag(cnt, 7) OVER w AS double), 0.0) / 256.0
                   ), 6) AS surge_ratio
            FROM c
            WINDOW w AS (PARTITION BY g ORDER BY bucket)
        """,
        # Simpson concentration: Σcᵢ²/n² with exact integer numerator
        # and denominator, one round-6 division each way
        # (see q_events_simpson).
        "events_simpson": """
            WITH c AS (
              SELECT user_id AS g, event_type AS s, count(*) AS c
              FROM events
              WHERE user_id IS NOT NULL AND event_type IS NOT NULL
              GROUP BY 1, 2
            )
            SELECT g AS user_id,
                   cast(sum(c) AS bigint) AS n_events,
                   cast(count(*) AS bigint) AS n_states,
                   round(cast(sum(c * c) AS double)
                         / cast(sum(c) * sum(c) AS double), 6) AS simpson,
                   round(cast(sum(c) * sum(c) AS double)
                         / cast(sum(c * c) AS double), 6) AS inv_simpson
            FROM c GROUP BY g
        """,
        # Nearest-event join: INDEPENDENT brute-force per-user join +
        # abs-gap argmin with the pinned (distance, earlier) tie order
        # — a completely different plan from the Spark union-merge
        # (see q_events_nearest_click). Integer epochs only.
        "events_nearest_click": """
            WITH a AS (
              SELECT event_id, user_id,
                     epoch_us(ts) // 1000000 AS e
              FROM events
              WHERE event_type = 'error'
                AND ts IS NOT NULL AND user_id IS NOT NULL
            ),
            b AS (
              SELECT user_id, epoch_us(ts) // 1000000 AS e
              FROM events
              WHERE event_type = 'click'
                AND ts IS NOT NULL AND user_id IS NOT NULL
            ),
            m AS (
              SELECT a.event_id, b.e AS be,
                     row_number() OVER (
                       PARTITION BY a.event_id
                       ORDER BY abs(b.e - a.e), b.e - a.e
                     ) AS rn
              FROM a JOIN b ON a.user_id = b.user_id
              WHERE abs(b.e - a.e) <= 86400
            )
            SELECT a.event_id, a.user_id,
                   cast(a.e AS bigint) AS left_epoch,
                   cast(m.be AS bigint) AS nearest_epoch,
                   cast(m.be - a.e AS bigint) AS gap_s
            FROM a LEFT JOIN (SELECT event_id, be FROM m WHERE rn = 1) m
              USING (event_id)
        """,
        # Soft-dedup weights: identical md5 content classes over the
        # replay-planted corpus; weight = ONE round-6 division
        # (see q_dedup_soft_weights).
        "dedup_soft_weights": """
            WITH corpus AS (
              SELECT doc_id, text FROM documents
              UNION ALL SELECT doc_id, text FROM documents
                WHERE doc_id % 7 = 0
              UNION ALL SELECT doc_id, text FROM documents
                WHERE doc_id % 7 = 0
              UNION ALL SELECT doc_id, text FROM documents
                WHERE doc_id % 13 = 0
            )
            SELECT doc_id,
                   cast(count(*) OVER (
                     PARTITION BY md5(coalesce(text, ''))
                   ) AS bigint) AS family_size,
                   round(cast(1 AS double) / cast(count(*) OVER (
                     PARTITION BY md5(coalesce(text, ''))
                   ) AS double), 6) AS weight
            FROM corpus
        """,
        "text_textrank": _textrank_oracle_sql(
            iterations=3, damping=0.85, k=20
        ),
        # Best-lag cross-correlation: identical dense-range moment
        # algebra; the shifted co-activity join is written the other
        # way around (cb.bucket = ca.bucket + lag) as an independence
        # check (see q_events_best_lag).
        "events_best_lag": """
            WITH ev AS (
              SELECT event_type AS g,
                     epoch_us(ts) // 1000000 // 3600 AS bucket
              FROM events WHERE ts IS NOT NULL
            ),
            c AS (SELECT g, bucket, count(*) AS x FROM ev GROUP BY 1, 2),
            rng AS (
              SELECT min(bucket) AS mn, max(bucket) AS mx,
                     max(bucket) - min(bucket) + 1 AS n
              FROM c
            ),
            lags AS (SELECT unnest(generate_series(-3, 3)) AS lag),
            mxm AS (
              SELECT g, sum(x) AS s1, sum(x * x) AS s2 FROM c GROUP BY g
            ),
            my AS (
              SELECT g, lag, sum(x) AS sy1, sum(x * x) AS sy2
              FROM c CROSS JOIN lags CROSS JOIN rng
              WHERE bucket >= mn + lag AND bucket <= mx + lag
              GROUP BY 1, 2
            ),
            xy AS (
              SELECT ca.g AS a, cb.g AS b, l.lag AS lag,
                     sum(ca.x * cb.x) AS sxy, count(*) AS n_shared
              FROM c ca
              CROSS JOIN lags l
              JOIN c cb ON cb.bucket = ca.bucket + l.lag AND ca.g < cb.g
              GROUP BY 1, 2, 3
              HAVING count(*) >= 3
            ),
            scored AS (
              SELECT a, b, xy.lag AS lag, n_shared,
                     rng.n * sxy - mxm.s1 * my.sy1 AS num,
                     rng.n * mxm.s2 - mxm.s1 * mxm.s1 AS vara,
                     rng.n * my.sy2 - my.sy1 * my.sy1 AS varb
              FROM xy
              JOIN mxm ON mxm.g = xy.a
              JOIN my ON my.g = xy.b AND my.lag = xy.lag
              CROSS JOIN rng
            ),
            ranked AS (
              -- factors cast to double BEFORE multiplying, mirroring
              -- the operator's overflow-safe form (identical while
              -- |num| < 2^53, gracefully degrading past it)
              SELECT a, b, lag, n_shared,
                     sign(num) AS direction,
                     round((cast(num AS double) * cast(num AS double))
                           / (cast(vara AS double)
                              * cast(varb AS double)), 6) AS r2,
                     row_number() OVER (
                       PARTITION BY a, b
                       ORDER BY round((cast(num AS double)
                                   * cast(num AS double))
                                 / (cast(vara AS double)
                                    * cast(varb AS double)), 6) DESC,
                                abs(lag) ASC, lag ASC
                     ) AS rk
              FROM scored
              WHERE vara > 0 AND varb > 0
            )
            SELECT a, b, cast(lag AS int) AS lag,
                   cast(n_shared AS bigint) AS n_shared,
                   cast(direction AS int) AS direction, r2
            FROM ranked WHERE rk = 1
        """,
        # Seasonally-adjusted deviation: identical epoch-integer
        # calendar math (Thursday-aligned weeks), exact integers, one
        # round-6 division (see q_events_seasonal_surge).
        "events_seasonal_surge": """
            WITH b AS (
              SELECT event_type AS g, epoch_us(ts) // 1000000 AS e
              FROM events WHERE ts IS NOT NULL
            ),
            cells AS (
              SELECT g,
                     (e + 4 * 86400) // (7 * 86400) AS week,
                     ((e // 86400 + 4) % 7) * 24 + (e // 3600) % 24
                       AS how,
                     count(*) AS cnt
              FROM b GROUP BY 1, 2, 3
            ),
            nw AS (SELECT count(DISTINCT week) AS nw FROM cells),
            base AS (
              SELECT g, how, sum(cnt) AS bt FROM cells GROUP BY 1, 2
            )
            SELECT c.g AS event_type,
                   cast(c.week AS bigint) AS week,
                   cast(c.how AS int) AS hour_of_week,
                   cast(c.cnt AS bigint) AS cnt,
                   cast(base.bt AS bigint) AS baseline_total,
                   round(cast(c.cnt * nw.nw AS double)
                         / cast(base.bt AS double), 6) AS ratio
            FROM cells c
            JOIN base ON base.g = c.g AND base.how = c.how
            CROSS JOIN nw
        """,
        # Seeded-Laplace DP counts: identical md5 inverse-CDF noise
        # chain; sign(±1) multiplications are exact so operand order
        # is immaterial, and the one ln's ULP is absorbed by the
        # post-add round-6 (see q_events_dp_counts).
        # Assistant-refusal profile over the planted transcripts: the
        # OR-of-contains predicate is GENERATED from the same
        # REFUSAL_PATTERNS tuple the operator scans (single source of
        # truth), literal substrings — no regex dialect seam
        # (see q_transcript_refusals).
        "transcript_refusals": _refusal_oracle_sql(),
        "events_profile_drift": _profile_drift_oracle_sql(),
        # Burrows' Delta: identical fixed-point z chain; the
        # zero-variance exclusion is an exact integer comparison on
        # both engines (see q_text_stylometry).
        "text_stylometry": """
            WITH toks AS (
              SELECT source AS src,
                     unnest(regexp_extract_all(lower(text),
                       '[a-z0-9]{2,}')) AS term
              FROM documents WHERE source IS NOT NULL
            ),
            counts AS (
              SELECT src, term, count(*) AS c FROM toks GROUP BY 1, 2
            ),
            totals AS (SELECT src, sum(c) AS n FROM counts GROUP BY 1),
            top AS (
              SELECT term FROM (
                SELECT term, row_number() OVER (
                  ORDER BY sum(c) DESC, term ASC
                ) AS rk
                FROM counts GROUP BY term
              ) WHERE rk <= 30
            ),
            grid AS (
              SELECT t.src, tp.term,
                     cast(round(cast(coalesce(c.c, 0) * 1000000 AS double)
                                / cast(t.n AS double)) AS bigint) AS f
              FROM totals t
              CROSS JOIN top tp
              LEFT JOIN counts c ON c.src = t.src AND c.term = tp.term
            ),
            mom AS (
              SELECT term, count(*) AS s, sum(f) AS sf,
                     sum(f * f) AS sf2
              FROM grid GROUP BY term
            ),
            z AS (
              SELECT g.src, g.term,
                     cast(m.s * g.f - m.sf AS double)
                       / sqrt(cast(m.s * m.sf2 - m.sf * m.sf AS double))
                       AS z
              FROM grid g JOIN mom m USING (term)
              WHERE m.s * m.sf2 - m.sf * m.sf > 0
            )
            SELECT a.src AS a, b.src AS b,
                   cast(count(*) AS bigint) AS n_terms,
                   round(sum(abs(a.z - b.z)) / count(*), 6) AS delta
            FROM z a JOIN z b ON a.term = b.term AND a.src < b.src
            GROUP BY 1, 2
        """,
        # Mann-Kendall + Theil-Sen: identical integer S / ×18 variance
        # / nearest-rank slope pick (see q_events_robust_trend).
        "events_robust_trend": """
            WITH c AS (
              SELECT event_type AS g,
                     epoch_us(ts) // 1000000 // 3600 AS h,
                     count(*) AS y
              FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
            ),
            p AS (
              SELECT a.g, a.h AS hi, a.y AS yi, b.h AS hj, b.y AS yj
              FROM c a JOIN c b ON a.g = b.g AND a.h < b.h
            ),
            mk AS (
              SELECT g, sum(sign(yj - yi)) AS s FROM p GROUP BY g
            ),
            nb AS (SELECT g, count(*) AS n FROM c GROUP BY g),
            tc AS (
              SELECT g, sum(t * (t - 1) * (2 * t + 5)) AS tie18
              FROM (SELECT g, y, count(*) AS t FROM c GROUP BY g, y)
              GROUP BY g
            ),
            mz AS (
              SELECT nb.g, nb.n, mk.s,
                     round((CASE WHEN mk.s > 0
                                 THEN cast(mk.s - 1 AS double)
                                 WHEN mk.s < 0
                                 THEN cast(mk.s + 1 AS double)
                                 ELSE 0.0 END)
                           / sqrt(cast(nb.n * (nb.n - 1) * (2 * nb.n + 5)
                                       - tc.tie18 AS double) / 18.0), 6)
                       AS mk_z
              FROM nb JOIN mk USING (g) JOIN tc USING (g)
              WHERE nb.n >= 2
                AND nb.n * (nb.n - 1) * (2 * nb.n + 5) - tc.tie18 > 0
            ),
            sen AS (
              SELECT g, round(sl, 6) AS sen_slope FROM (
                SELECT g, sl,
                       row_number() OVER (
                         PARTITION BY g ORDER BY sl, hi, hj
                       ) AS rn,
                       count(*) OVER (PARTITION BY g) AS m
                FROM (
                  SELECT g, hi, hj,
                         cast(yj - yi AS double)
                           / cast(hj - hi AS double) AS sl
                  FROM p
                )
              ) WHERE rn = cast(ceil(m / 2.0) AS bigint)
            )
            SELECT mz.g AS event_type,
                   cast(mz.n AS bigint) AS n_buckets,
                   cast(mz.s AS bigint) AS mk_s,
                   mz.mk_z, sen.sen_slope
            FROM mz JOIN sen USING (g)
        """,
        # Two-sample KS: identical integer-numerator cumulative chain,
        # integer argmax with value-ASC tiebreak
        # (see q_events_ks_drift).
        "events_ks_drift": """
            WITH m AS (
              SELECT value AS v,
                     CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END AS da,
                     CASE WHEN event_id % 2 = 1 THEN 1 ELSE 0 END AS db
              FROM events WHERE value IS NOT NULL
            ),
            per AS (
              SELECT v, sum(da) AS da, sum(db) AS db FROM m GROUP BY v
            ),
            cum AS (
              SELECT v,
                     sum(da) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
                       PRECEDING AND CURRENT ROW) AS ca,
                     sum(db) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
                       PRECEDING AND CURRENT ROW) AS cb,
                     sum(da) OVER () AS na,
                     sum(db) OVER () AS nb
              FROM per
            )
            SELECT cast(na AS bigint) AS n_a,
                   cast(nb AS bigint) AS n_b,
                   v AS at_value,
                   round(cast(abs(ca * nb - cb * na) AS double)
                         / cast(na * nb AS double), 6) AS ks_d
            FROM cum WHERE na > 0 AND nb > 0
            ORDER BY abs(ca * nb - cb * na) DESC, v ASC LIMIT 1
        """,
        # Cluster-balanced sampling: the shared unrolled-Lloyd CTE
        # chain + an md5-priority window draw per cluster
        # (see q_sample_cluster_balanced).
        "sample_cluster_balanced": f"""
            WITH {_kmeans_assign_ctes(4, 2, 1024)}
            SELECT vec_id, cast(cluster AS bigint) AS cluster,
                   cast(rk AS int) AS draw_rank
            FROM (
              SELECT id AS vec_id, cluster,
                     row_number() OVER (
                       PARTITION BY cluster
                       ORDER BY md5_number_upper(
                         'cbal:' || cast(id AS varchar)
                       ), id
                     ) AS rk
              FROM assign2
            ) WHERE rk <= 8
        """,
        # Vocabulary richness: identical token CTE + two cascaded
        # integer aggregates; bias-corrected Chao1 and Good-Turing
        # coverage are each one round-6 division
        # (see q_text_vocab_richness).
        "text_vocab_richness": """
            WITH toks AS (
              SELECT unnest(regexp_extract_all(lower(text),
                       '[a-z0-9]{2,}')) AS term
              FROM documents WHERE doc_id % 5 = 0
            ),
            tf AS (SELECT term, count(*) AS c FROM toks GROUP BY term),
            agg AS (
              SELECT count(*) AS s_obs, sum(c) AS n,
                     sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS f1,
                     sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS f2
              FROM tf
            )
            SELECT cast(s_obs AS bigint) AS s_obs,
                   cast(n AS bigint) AS n_tokens,
                   cast(f1 AS bigint) AS f1,
                   cast(f2 AS bigint) AS f2,
                   CASE WHEN n > 0 THEN
                     round(s_obs + cast(f1 * (f1 - 1) AS double)
                           / cast(2 * (f2 + 1) AS double), 6)
                   END AS chao1,
                   CASE WHEN n > 0 THEN
                     round(1.0 - cast(f1 AS double) / cast(n AS double), 6)
                   END AS coverage
            FROM agg
        """,
        "events_dp_counts": """
            WITH c AS (
              SELECT event_type, user_id, count(*) AS tc
              FROM events
              WHERE event_type IS NOT NULL AND user_id IS NOT NULL
              GROUP BY 1, 2
            ),
            u AS (
              SELECT event_type, user_id, tc,
                     (cast(md5_number_upper('dp:'
                        || coalesce(event_type, chr(0) || 'null')
                        || chr(31)
                        || coalesce(cast(user_id AS varchar),
                                    chr(0) || 'null')) % 1000000
                        AS double) + 0.5) / 1000000.0 AS u
              FROM c
            )
            SELECT event_type, user_id,
                   round(tc + (-(1.0 / 0.5) * sign(u - 0.5)
                         * ln(1.0 - 2.0 * abs(u - 0.5))), 6)
                     AS noisy_count
            FROM u
        """,
    }
