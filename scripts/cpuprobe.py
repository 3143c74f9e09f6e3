"""Ad-hoc: sample whole-box CPU% while the fused pipeline runs (local[32])."""
import os, tempfile, shutil, time, sys, threading

sys.path.insert(0, "/root/repo")
from threat_intelligence_knowledge_graph_spark.session import build_session
from threat_intelligence_knowledge_graph_spark.datagen import generate_transcripts_df
from threat_intelligence_knowledge_graph_spark.operators.extraction import extract_graph_records_fused

samples = []
stop = False

def sampler():
    prev = None
    while not stop:
        with open("/proc/stat") as f:
            parts = f.readline().split()
        vals = list(map(int, parts[1:9]))
        idle = vals[3] + vals[4]
        total = sum(vals)
        if prev:
            dt = total - prev[0]
            di = idle - prev[1]
            samples.append(100 * (1 - di / dt) if dt else 0)
        prev = (total, idle)
        time.sleep(1)

d = tempfile.mkdtemp()
p = os.path.join(d, "t.parquet")
s = build_session("gen", master="local[32]", shuffle_partitions=64)
generate_transcripts_df(s, 200000, partitions=128).write.parquet(p)
s.stop()

s = build_session("b", master="local[32]", shuffle_partitions=64)
tr = s.read.parquet(p)
tr.count()
extract_graph_records_fused(tr.limit(4000)).count()
th = threading.Thread(target=sampler)
th.start()
t0 = time.time()
tri = (
    extract_graph_records_fused(tr)
    .filter("kind='edge'")
    .select("src_id", "rel_type", "dst_id")
    .distinct()
    .count()
)
dt = time.time() - t0
stop = True
th.join()
print("wall", round(dt, 1), "cpu% per sec:", [round(x) for x in samples])
s.stop()
shutil.rmtree(d)
