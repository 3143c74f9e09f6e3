"""Stage A/B tests: per-turn equality invariant + chunker parity."""

import pandas as pd

from threat_intelligence_knowledge_graph_spark.datagen import transcripts_rows
from threat_intelligence_knowledge_graph_spark.operators.chunker import (
    chunk_documents,
    chunk_for_profile,
)
from threat_intelligence_knowledge_graph_spark.operators.reassembly import (
    explode_back,
    reassemble,
    validate_turns,
)
from threat_intelligence_knowledge_graph_spark.schemas import TRANSCRIPTS_SCHEMA


def _transcripts(spark, n_convs=12):
    return spark.createDataFrame(
        pd.DataFrame(transcripts_rows(n_convs)), schema=TRANSCRIPTS_SCHEMA
    )


def reference_chunker(text: str, char_limit: int, overlap: int) -> list[str]:
    """Verbatim semantics of reference main.py:59-74 (test-only oracle)."""
    chunks, start = [], 0
    while start < len(text):
        chunk = text[start : start + char_limit]
        if not chunk:
            break
        chunks.append(chunk)
        start += char_limit - overlap
        if start >= len(text):
            break
    return chunks


class TestReassembly:
    def test_per_turn_equality_invariant(self, spark):
        transcripts = _transcripts(spark)
        assert validate_turns(transcripts).count() == 0
        docs = reassemble(transcripts)
        back = explode_back(docs).toPandas().sort_values(["conv_id", "turn_idx"])
        orig = (
            transcripts.select("conv_id", "turn_idx", "text")
            .toPandas()
            .sort_values(["conv_id", "turn_idx"])
        )
        assert back["text"].tolist() == orig["text"].tolist()
        assert back["conv_id"].tolist() == orig["conv_id"].tolist()

    def test_salted_two_phase_identical(self, spark):
        transcripts = _transcripts(spark)
        direct = reassemble(transcripts).orderBy("conv_id").toPandas()
        salted = reassemble(transcripts, salt_blocks=4).orderBy("conv_id").toPandas()
        assert direct["doc_text"].tolist() == salted["doc_text"].tolist()
        assert direct["n_turns"].tolist() == salted["n_turns"].tolist()

    def test_doc_counts(self, spark):
        transcripts = _transcripts(spark, n_convs=10)
        docs = reassemble(transcripts)
        assert docs.count() == 10
        row = docs.filter("conv_id = 'conv_00000007'").first()  # hot conv
        assert row.n_turns >= 60


class TestChunker:
    def test_matches_reference_loop(self, spark):
        texts = [
            ("a", "x" * 10),
            ("b", "y" * 2048),
            ("c", "z" * 5000),
            ("d", "w" * 2047),
            ("e", "q" * 2049),
            ("f", "abcdefghij" * 1000),
        ]
        docs = spark.createDataFrame(
            [(c, t) for c, t in texts], ["conv_id", "doc_text"]
        )
        got = (
            chunk_documents(docs, 2048, 24)
            .orderBy("conv_id", "chunk_index")
            .toPandas()
        )
        for conv_id, text in texts:
            expected = reference_chunker(text, 2048, 24)
            mine = got[got.conv_id == conv_id]
            assert mine["chunk_text"].tolist() == expected, conv_id
            assert mine["total_chunks"].tolist() == [len(expected)] * len(expected)

    def test_small_limits(self, spark):
        docs = spark.createDataFrame([("a", "abcdefghij")], ["conv_id", "doc_text"])
        got = chunk_documents(docs, 4, 1).orderBy("chunk_index").toPandas()
        assert got["chunk_text"].tolist() == reference_chunker("abcdefghij", 4, 1)

    def test_ner_profile_whole_doc(self, spark):
        docs = spark.createDataFrame([("a", "x" * 9000)], ["conv_id", "doc_text"])
        got = chunk_for_profile(docs, "ner").toPandas()
        assert len(got) == 1
        assert got["chunk_text"][0] == "x" * 9000
        assert got["total_chunks"][0] == 1


class TestNullTurns:
    def test_null_text_preserved_as_empty_line(self, spark):
        import datetime
        rows = [
            {"conv_id": "c1", "turn_idx": 0, "role": "user", "text": "hello",
             "tool": None, "ts": datetime.datetime(2025, 1, 1)},
            {"conv_id": "c1", "turn_idx": 1, "role": "assistant", "text": None,
             "tool": None, "ts": datetime.datetime(2025, 1, 1)},
            {"conv_id": "c1", "turn_idx": 2, "role": "user", "text": "bye",
             "tool": None, "ts": datetime.datetime(2025, 1, 1)},
        ]
        df = spark.createDataFrame(pd.DataFrame(rows), schema=TRANSCRIPTS_SCHEMA)
        r = reassemble(df).first()
        # NULL turn = empty line; turn count and exploded lines must agree.
        assert r.doc_text == "hello\n\nbye"
        assert r.n_turns == 3
        back = explode_back(reassemble(df)).collect()
        assert [b.text for b in sorted(back, key=lambda b: b.turn_idx)] == ["hello", "", "bye"]

    def test_fused_kernel_null_text(self, spark):
        import datetime
        from threat_intelligence_knowledge_graph_spark.operators.extraction import (
            extract_graph_records_fused,
        )
        rows = [
            {"conv_id": "c1", "turn_idx": 0, "role": "user",
             "text": "The domain evil.example.net resolves", "tool": None,
             "ts": datetime.datetime(2025, 1, 1)},
            {"conv_id": "c1", "turn_idx": 1, "role": "assistant", "text": None,
             "tool": None, "ts": datetime.datetime(2025, 1, 1)},
            {"conv_id": "c1", "turn_idx": 2, "role": "user",
             "text": "to 10.1.1.1 now.", "tool": None,
             "ts": datetime.datetime(2025, 1, 1)},
        ]
        df = spark.createDataFrame(pd.DataFrame(rows), schema=TRANSCRIPTS_SCHEMA)
        out = extract_graph_records_fused(df, num_partitions=2)
        ids = {r.node_id for r in out.filter("kind='node'").collect()}
        # No 'None' artifacts in any id.
        assert not any("None" in i for i in ids)
        assert "Domain_Evil_Example_Net" in ids and "Ipv4_10_1_1_1" in ids
