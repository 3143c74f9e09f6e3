"""rcATT-style ATT&CK tactic/technique classification — the design slot.

The reference loads pickled sklearn rcATT models (TF-IDF + linear
classifiers) and, with them absent, executes the empty fallback
(reference ner_extractor.py:128-135,231-233) — that fallback IS the
parity behavior and stays pinned. This module fills the design slot the
reference leaves empty, Spark-first and trainable offline:

- ``preprocess_for_rcatt`` — Catalyst twin of the reference's text
  cleaning chain (ner_extractor.py:311-343): lowercase, URL/email/IP/
  file-path/hash placeholders, non-word strip, whitespace normalize.
- ``RcattClassifier`` — multi-label TF-IDF + per-label logistic
  regression on Spark ML (RegexTokenizer → HashingTF → IDF → one binary
  LogisticRegression per ATT&CK code; rcATT's published architecture,
  re-expressed with distributed training and DataFrame-native scoring).
- ``technique_tactic_edges`` — op 24 (reference ner_extractor.py:728-767):
  the reference links EVERY detected technique to EVERY detected tactic
  of the same document with SUBTECHNIQUE_OF (its code comments defer the
  real technique→tactic matrix); same pinned behavior here.

Everything is OFF for parity: nothing imports this module unless the
caller opts in (``attack_tagging`` flag / direct use).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, functions as F

from ..functions.strings import node_id_expr, py_title_expr
from ..kernel.extract import store_label

# The 12 enterprise tactic codes (reference models/attack_data CODE_TACTICS).
CODE_TACTICS: list[str] = [
    "TA0001", "TA0002", "TA0003", "TA0004", "TA0005", "TA0006",
    "TA0007", "TA0008", "TA0009", "TA0010", "TA0011", "TA0040",
]

# Reference preprocessing chain (ner_extractor.py:322-337), order pinned.
# All patterns are RE2-safe, so the same strings run in Spark SQL.
_PREPROCESS_STEPS: list[tuple[str, str]] = [
    (r"http(s)?:\\[0-9a-zA-Z_\.\-\\]+.", "URL"),
    (r"\b([a-z][_a-z0-9-.]+@[a-z0-9-]+\.[a-z]+)\b", "email"),
    (r"\b(\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3})\b", "IP"),
    (r"[a-zA-Z]{1}:\\[0-9a-zA-Z_\.\-\\]+", "file"),
    (r"\b[a-fA-F\d]{32}\b|\b[a-fA-F\d]{40}\b|\b[a-fA-F\d]{64}\b", "hash"),
    (r"\W", " "),
    (r"\s+", " "),
]


def preprocess_for_rcatt(col: Column) -> Column:
    """Catalyst expression: the rcATT cleaning chain over a text column."""
    out = F.lower(col)
    for pattern, repl in _PREPROCESS_STEPS:
        out = F.regexp_replace(out, pattern, repl)
    return F.trim(out)


@dataclass
class RcattClassifier:
    """Multi-label classifier: shared TF-IDF featurization + one binary
    logistic regression per ATT&CK code. Train on any (text, codes[])
    corpus; scoring is a pure DataFrame transform (no Python UDFs)."""

    codes: list[str]
    _featurizer: object = None  # fitted PipelineModel (tokenize→TF→IDF)
    _models: dict | None = None  # code -> LogisticRegressionModel

    @staticmethod
    def train(
        labeled: DataFrame,
        codes: list[str],
        text_col: str = "text",
        labels_col: str = "codes",
        num_features: int = 1 << 14,
        reg_param: float = 0.01,
    ) -> "RcattClassifier":
        """``labeled``: (text, codes: array<string>). Fits the shared
        featurizer once, then one LR per code on the same cached features
        (the multi-label pattern rcATT uses, distributed)."""
        from pyspark.ml import Pipeline
        from pyspark.ml.classification import LogisticRegression
        from pyspark.ml.feature import IDF, HashingTF, RegexTokenizer

        pipe = Pipeline(
            stages=[
                RegexTokenizer(
                    inputCol="_clean", outputCol="_toks", pattern=r"\s+"
                ),
                HashingTF(
                    inputCol="_toks", outputCol="_tf", numFeatures=num_features
                ),
                IDF(inputCol="_tf", outputCol="features"),
            ]
        )
        prepared = labeled.withColumn(
            "_clean", preprocess_for_rcatt(F.col(text_col))
        )
        featurizer = pipe.fit(prepared)
        feats = featurizer.transform(prepared).select(
            "features", F.col(labels_col).alias("_codes")
        ).cache()
        models = {}
        for code in codes:
            binary = feats.withColumn(
                "label", F.array_contains("_codes", code).cast("double")
            )
            # Per-code output column names so scoring can CHAIN every
            # model's transform over one featurized frame (a single pass)
            # instead of re-running TF-IDF once per code.
            lr = LogisticRegression(
                featuresCol="features",
                labelCol="label",
                regParam=reg_param,
                probabilityCol=f"_prob_{code}",
                rawPredictionCol=f"_raw_{code}",
                predictionCol=f"_pred_{code}",
            )
            models[code] = lr.fit(binary)
        feats.unpersist()
        return RcattClassifier(codes=codes, _featurizer=featurizer, _models=models)

    def classify(
        self,
        documents: DataFrame,
        id_col: str = "conv_id",
        text_col: str = "doc_text",
        threshold: float = 0.5,
    ) -> DataFrame:
        """(id, code, confidence) — one row per detected label.

        Scoring is ONE pass: every per-code model's transform chains over
        the same featurized frame (each writes its own ``_prob_<code>``
        column), then an explode over per-code structs stacks detections.
        Detection = P(label) ≥ threshold (the reference consumes
        predict() == 1, the same 0.5 cut for sklearn linear models)."""
        from pyspark.ml.functions import vector_to_array

        if self._featurizer is None or not self._models:
            raise ValueError("classifier is untrained — call RcattClassifier.train")
        prepared = documents.select(
            F.col(id_col).alias("_id"), F.col(text_col).alias("_text")
        ).withColumn("_clean", preprocess_for_rcatt(F.col("_text")))
        scored = self._featurizer.transform(prepared)
        for model in self._models.values():
            scored = model.transform(scored)
        stacked = scored.select(
            "_id",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(code).alias("code"),
                            F.element_at(
                                vector_to_array(f"_prob_{code}"), 2
                            ).alias("confidence"),
                        )
                        for code in self._models
                    ]
                )
            ).alias("_d"),
        )
        return stacked.filter(F.col("_d.confidence") >= threshold).select(
            F.col("_id").alias(id_col),
            F.col("_d.code").alias("code"),
            F.col("_d.confidence").alias("confidence"),
        )


def attack_nodes(detections: DataFrame, node_type: str) -> DataFrame:
    """Detected codes → stored-form node records (store normalization =
    neo4j_store.py:109-135 like every other node). Pure Catalyst: the
    JVM twins of py_title/create_node_id (property-tested against
    CPython in test_strings.py) keep this plan Python-free."""
    make_id = py_title_expr(node_id_expr(F.lit(node_type), F.col("code")))
    label = store_label(node_type)
    return detections.select(
        F.lit(label).alias("node_label"),
        make_id.alias("node_id"),
        F.create_map(
            F.lit("id"), F.col("code"),
            F.lit("confidence"), F.round("confidence", 6).cast("string"),
        ).alias("properties"),
    ).dropDuplicates(["node_label", "node_id"])


def technique_tactic_edges(
    technique_detections: DataFrame,
    tactic_detections: DataFrame,
    id_col: str = "conv_id",
) -> DataFrame:
    """Op 24 (reference ner_extractor.py:728-767): SUBTECHNIQUE_OF from
    every detected technique to every detected tactic of the same
    document — the reference's pinned per-document cross join (it defers
    the real technique→tactic matrix; so do we, citing the same TODO)."""
    tech_id = py_title_expr(
        node_id_expr(F.lit("ATT&CK_Technique"), F.col("code"))
    )
    tac_id = py_title_expr(node_id_expr(F.lit("ATT&CK_Tactic"), F.col("code")))
    t = technique_detections.select(
        F.col(id_col).alias("_id"), tech_id.alias("src_id")
    )
    a = tactic_detections.select(
        F.col(id_col).alias("_id"), tac_id.alias("dst_id")
    )
    return (
        t.join(a, "_id")
        .select(
            F.lit(store_label("ATT&CK_Technique")).alias("src_label"),
            "src_id",
            F.lit("SUBTECHNIQUE_OF").alias("rel_type"),
            F.lit(store_label("ATT&CK_Tactic")).alias("dst_label"),
            "dst_id",
        )
        .distinct()
    )
