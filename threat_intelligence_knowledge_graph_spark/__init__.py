"""PySpark-native threat-intelligence knowledge-graph construction engine.

A from-scratch, Spark-first rebuild of the capabilities of the reference
repo F3dai/Threat-intelligence-knowledge-graph (studied read-only at
/root/reference): multi-turn transcript ingestion, deterministic NER-style
IOC mention detection, STIX-flavored entity typing, rule-based relation
extraction, entity canonicalization, and materialization of deduplicated
(subj, pred, obj) triple + node/edge tables — expressed as DataFrame
transformations plus two Arrow-batched pandas kernels, designed for
multi-executor clusters at 10^12-turn scale.

Nothing here is a port: the reference is a single-process per-document
Python loop (reference main.py:255-324); this package is a partitioned,
shuffle-aware dataflow with checkpointed stages.
"""

__version__ = "0.1.0"
