"""rcATT design-slot tests: preprocessing twin, multi-label training on
synthetic labeled fixtures, technique→tactic edges (op 24). All OFF for
parity — nothing here touches the deterministic extraction path."""

import pytest

from pyspark.sql import functions as F

from threat_intelligence_knowledge_graph_spark.operators.rcatt import (
    CODE_TACTICS,
    RcattClassifier,
    attack_nodes,
    preprocess_for_rcatt,
    technique_tactic_edges,
)

# keyword vocab per tactic (distinctive, disjoint) — synthetic fixture
VOCAB = {
    "TA0001": ["phishing", "spearphish", "attachment", "lure"],
    "TA0002": ["execution", "powershell", "script", "interpreter"],
    "TA0006": ["credential", "password", "keylogger", "dumping"],
    "TA0008": ["lateral", "movement", "smb", "winrm"],
    "TA0011": ["beacon", "c2", "callback", "heartbeat"],
}
FILLER = "the report describes activity observed during the intrusion".split()


def _corpus():
    rows = []
    i = 0
    for code, words in VOCAB.items():
        for k in range(8):
            text = " ".join(
                FILLER[: 3 + k % 4]
                + [words[k % len(words)], words[(k + 1) % len(words)]]
                + FILLER[k % 3 :]
            )
            rows.append((f"d{i}", text, [code]))
            i += 1
    # multi-label rows
    rows.append(("dm1", "phishing attachment then powershell script ran", ["TA0001", "TA0002"]))
    rows.append(("dm2", "beacon c2 callback after credential dumping", ["TA0011", "TA0006"]))
    return rows


class TestPreprocess:
    def test_chain(self, spark):
        df = spark.createDataFrame(
            [("Attack via 10.1.2.3 used hash d41d8cd98f00b204e9800998ecf8427e, e-mail bob@evil.com!",)],
            ["t"],
        )
        out = df.select(preprocess_for_rcatt(F.col("t")).alias("c")).first().c
        assert "IP" in out and "hash" in out and "email" in out
        assert "@" not in out and "." not in out  # \W stripped
        assert "  " not in out


class TestClassifier:
    @pytest.fixture(scope="class")
    def model(self, spark):
        rows = _corpus()
        df = spark.createDataFrame(rows, ["conv_id", "text", "codes"])
        return RcattClassifier.train(df, list(VOCAB), text_col="text")

    def test_holdout_detection(self, spark, model):
        holdout = spark.createDataFrame(
            [
                ("h1", "spearphish lure with malicious attachment delivered"),
                ("h2", "powershell interpreter executed a script payload"),
                ("h3", "keylogger captured password material for dumping"),
            ],
            ["conv_id", "doc_text"],
        )
        got = {
            (r.conv_id, r.code)
            for r in model.classify(holdout, threshold=0.5).collect()
        }
        assert ("h1", "TA0001") in got
        assert ("h2", "TA0002") in got
        assert ("h3", "TA0006") in got
        # no cross-tactic false positives on these clean holdouts
        assert ("h1", "TA0006") not in got and ("h2", "TA0001") not in got

    def test_untrained_raises(self):
        with pytest.raises(ValueError):
            RcattClassifier(codes=CODE_TACTICS).classify(None)

    def test_attack_nodes_and_edges(self, spark, model):
        docs = spark.createDataFrame(
            [("h1", "phishing lure attachment then powershell script execution")],
            ["conv_id", "doc_text"],
        )
        tactics = model.classify(docs, threshold=0.5)
        # simulate technique detections with a literal frame (technique
        # models train identically; op-24 wiring is what's under test)
        techniques = spark.createDataFrame(
            [("h1", "T1566", 0.9), ("h1", "T1059", 0.8)],
            ["conv_id", "code", "confidence"],
        )
        nodes = attack_nodes(tactics, "ATT&CK_Tactic").collect()
        assert nodes and all(n.node_label == "Att&ck_tactic" for n in nodes)
        assert all(n.node_id.startswith("Att&Ck_Tactic_Ta") for n in nodes)
        edges = technique_tactic_edges(techniques, tactics).collect()
        n_tactics = tactics.count()
        # reference behavior: every technique × every tactic of the doc
        assert len(edges) == 2 * n_tactics and n_tactics >= 1
        assert all(e.rel_type == "SUBTECHNIQUE_OF" for e in edges)
        assert all(e.src_id.startswith("Att&Ck_Technique_T") for e in edges)
