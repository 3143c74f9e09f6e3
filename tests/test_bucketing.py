"""Storage-partitioned input: bucketed transcripts make the reassembly
shuffle disappear (the 100 TB design claim in PLANS.md, proven locally)."""

import pandas as pd
import pytest

from threat_intelligence_knowledge_graph_spark.datagen import transcripts_rows
from threat_intelligence_knowledge_graph_spark.operators.reassembly import reassemble
from threat_intelligence_knowledge_graph_spark.schemas import TRANSCRIPTS_SCHEMA


@pytest.fixture(scope="module")
def bucketed_table(spark, tmp_path_factory):
    df = spark.createDataFrame(
        pd.DataFrame(transcripts_rows(30)), TRANSCRIPTS_SCHEMA
    )
    (
        df.write.bucketBy(8, "conv_id")
        .sortBy("conv_id", "turn_idx")
        .mode("overwrite")
        .saveAsTable("transcripts_bucketed_test")
    )
    yield df, spark.table("transcripts_bucketed_test")
    spark.sql("DROP TABLE IF EXISTS transcripts_bucketed_test")


class TestBucketedReassembly:
    def test_no_exchange_in_plan(self, spark, bucketed_table):
        _, bt = bucketed_table
        plan = reassemble(bt)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan

    def test_output_identical_to_shuffled_path(self, spark, bucketed_table):
        df, bt = bucketed_table
        a = reassemble(bt).orderBy("conv_id").toPandas()
        b = reassemble(df).orderBy("conv_id").toPandas()
        assert a["doc_text"].tolist() == b["doc_text"].tolist()
        assert a["n_turns"].tolist() == b["n_turns"].tolist()
