"""Tests for text-analysis + multimodal plumbing operators."""

import pytest
from pyspark.sql import functions as F

from threat_intelligence_knowledge_graph_spark.operators.multimodal import (
    decode_assets,
    frame_sample,
    resize_plan,
    synth_assets,
)
from threat_intelligence_knowledge_graph_spark.operators.text_quality import (
    fingerprints,
    language_id,
    quality_metrics,
    quality_score,
    token_counts,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


class TestTokenCounts:
    def test_known_counts(self, spark):
        df = spark.createDataFrame([(1, "Hello, world! 42 times")], ["doc_id", "text"])
        r = token_counts(df).first()
        assert r.ws_tokens == 4
        # BPE-ish: Hello , world ! 42 times
        assert r.bpe_tokens == 6

    def test_real_docs_nonzero(self, docs):
        assert token_counts(docs).filter("ws_tokens <= 0").count() == 0


class TestQuality:
    def test_metrics_ranges(self, docs):
        m = quality_metrics(docs)
        bad = m.filter(
            (F.col("punct_ratio") < 0) | (F.col("punct_ratio") > 1)
            | (F.col("stopword_ratio") < 0) | (F.col("stopword_ratio") > 1)
        )
        assert bad.count() == 0

    def test_prose_beats_salad(self, spark):
        prose = (
            "The analysis shows that the actor used a new tool and it was "
            "effective for the campaign in this region."
        )
        salad = "x9 !!! ### $$$ %%% ^^^ &&& *** ((( ))) @@@ ~~~"
        df = spark.createDataFrame([(1, prose), (2, salad)], ["doc_id", "text"])
        got = {r.doc_id: r.quality for r in quality_score(df).collect()}
        assert got[1] > got[2]


class TestLanguageId:
    def test_obvious_cases(self, spark):
        df = spark.createDataFrame(
            [
                (1, "the cat and the dog are in the house with a ball"),
                (2, "el gato y la casa de los amigos en una calle"),
                (3, "der hund und die katze sind in den garten mit ein ball"),
            ],
            ["doc_id", "text"],
        )
        got = {r.doc_id: r.lang_pred for r in language_id(df).collect()}
        assert got == {1: "en", 2: "es", 3: "de"}


class TestFingerprint:
    def test_deterministic_and_length(self, spark):
        df = spark.createDataFrame(
            [(1, "fingerprint this exact text"), (2, "fingerprint this exact text")],
            ["doc_id", "text"],
        )
        got = {r.doc_id: tuple(r.fingerprint) for r in fingerprints(df).collect()}
        assert got[1] == got[2] and len(got[1]) == 5

    def test_different_texts_differ(self, spark):
        df = spark.createDataFrame(
            [(1, "first document body"), (2, "second document body entirely")],
            ["doc_id", "text"],
        )
        got = {r.doc_id: tuple(r.fingerprint) for r in fingerprints(df).collect()}
        assert got[1] != got[2]


class TestMultimodal:
    def test_synth_and_decode_roundtrip(self, spark):
        assets = synth_assets(spark, 30)
        assert assets.count() == 30
        decoded = decode_assets(assets).cache()
        assert decoded.count() == 30
        # Kind recovered from payload header matches the column.
        joined = decoded.alias("d").join(assets.alias("a"), "asset_id")
        assert joined.filter("d.kind != a.kind").count() == 0
        feat = decoded.first()
        assert len(feat.features) == 8
        assert abs(sum(feat.features) - 1.0) < 1e-3  # histogram normalized

    def test_frame_sample_only_video(self, spark):
        decoded = decode_assets(synth_assets(spark, 30)).cache()
        frames = frame_sample(decoded, every_n=5)
        kinds = decoded.filter("kind = 'video'").count()
        assert frames.select("asset_id").distinct().count() == kinds

    def test_resize_plan_bounds(self, spark):
        decoded = decode_assets(synth_assets(spark, 30))
        r = resize_plan(decoded, target=32)
        assert r.filter("out_width > 32 OR out_height > 32").count() == 0

    def test_real_decode_gated(self, spark):
        import pytest as _pytest

        assets = synth_assets(spark, 3)
        try:
            import PIL  # noqa: F401

            _pytest.skip("PIL present; stub gate not applicable")
        except ImportError:
            with _pytest.raises(NotImplementedError):
                decode_assets(assets, fake=False)


class TestScrubPii:
    def test_typed_placeholders(self, spark):
        from threat_intelligence_knowledge_graph_spark.operators.text_quality import (
            scrub_pii,
        )

        df = spark.createDataFrame(
            [
                (1, "mail alice.smith+x@corp.example.com or call (555) 123-4567"),
                (2, "ssn 123-45-6789 card 4111 1111 1111 1111 ok"),
                (3, "clean text with no pii at all"),
            ],
            ["doc_id", "text"],
        )
        got = {r.doc_id: r.text for r in scrub_pii(df).collect()}
        assert got[1] == "mail <EMAIL> or call <PHONE>"
        assert got[2] == "ssn <SSN> card <CARD> ok"
        assert got[3] == "clean text with no pii at all"

    def test_email_redacted_before_phone_pattern(self, spark):
        """An email's digit runs must vanish inside <EMAIL>, not be
        half-matched by the phone pattern (the list-order contract)."""
        from threat_intelligence_knowledge_graph_spark.operators.text_quality import (
            scrub_pii,
        )

        df = spark.createDataFrame([(1, "x 555-123-4567@evil.example.com y")], ["doc_id", "text"])
        assert scrub_pii(df).first().text == "x <EMAIL> y"


class TestRepetitionRatio:
    def test_values(self, spark):
        from threat_intelligence_knowledge_graph_spark.operators.text_quality import (
            repetition_ratio,
        )

        df = spark.createDataFrame(
            [
                (1, "abcdefgh" * 10),          # pure repetition
                (2, "the quick brown fox jumps over the lazy dog"),
                (3, "short"),                  # < shingle chars → 0
            ],
            ["doc_id", "text"],
        )
        got = {r.doc_id: r.rep_ratio for r in repetition_ratio(df).collect()}
        # 80 chars → 73 shingles, 8 distinct (cyclic) → 1 - 8/73
        assert abs(got[1] - (1 - 8 / 73)) < 1e-9
        assert got[2] == 0.0  # every 8-gram of a pangram-ish line is novel
        assert got[3] == 0.0
