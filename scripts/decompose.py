"""Ad-hoc: decompose pinned-32 pipeline cost at 200k convs."""
import sys, time

sys.path.insert(0, "/root/repo")
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from threat_intelligence_knowledge_graph_spark.session import build_session
from threat_intelligence_knowledge_graph_spark.operators.extraction import (
    extract_graph_records_fused,
)

P = sys.argv[1]
s = build_session("dec", master="local[32]", shuffle_partitions=64)
tr = s.read.parquet(P)
tr.count()
extract_graph_records_fused(tr.limit(4000)).count()

SCH = StructType([StructField("n", LongType())])


def passthrough(batches):
    total = 0
    for pdf in batches:
        total += len(pdf)
    yield pd.DataFrame({"n": [total]})


def timed(name, fn):
    t0 = time.time()
    fn()
    print(name, round(time.time() - t0, 2), flush=True)


base = tr.select("conv_id", "turn_idx", "text").repartition(64, "conv_id")
timed("a_input_only", lambda: base.mapInPandas(passthrough, SCH).count())
timed("b_fused_noop", lambda: extract_graph_records_fused(tr).write.format("noop").mode("overwrite").save())
timed("c_fused_edges_noop", lambda: extract_graph_records_fused(tr)
      .filter("kind='edge'").select("src_id", "rel_type", "dst_id")
      .write.format("noop").mode("overwrite").save())
timed("d_full_distinct", lambda: extract_graph_records_fused(tr)
      .filter("kind='edge'").select("src_id", "rel_type", "dst_id").distinct().count())
s.stop()
