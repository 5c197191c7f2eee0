"""Three invert reps at local[32]; between reps record the live
pyspark.daemon worker PIDs and per-rep user/system CPU split of the
python workers — discriminates worker respawn + kernel-vs-user burn."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def workers():
    out = {}
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/cmdline") as f:
                cmd = f.read()
            if "pyspark.daemon" in cmd:
                with open(f"/proc/{pid}/stat") as f:
                    v = f.read().rsplit(")", 1)[1].split()
                tick = os.sysconf("SC_CLK_TCK")
                out[int(pid)] = (int(v[11])/tick, int(v[12])/tick)  # u, s
        except OSError:
            continue
    return out

from lucenenet_spark.index.segments import SEGMENT_SCHEMA, _invert_partition
from lucenenet_spark.session import get_spark
from lucenenet_spark.sources.corpus import corpus_df, with_doc_ids

spark = get_spark("diag_pids", cpus=32)
spark.sparkContext.setLogLevel("ERROR")
corpus = with_doc_ids(corpus_df(spark, 500000, partitions=64), ("repo","path")).cache()
corpus.count()
inv = corpus.select("doc_id","content","lang").mapInPandas(
    _invert_partition("content","doc_id","content","lang",True), SEGMENT_SCHEMA)

prev = workers()
for rep in range(4):
    t0 = time.time()
    inv.write.format("noop").mode("overwrite").save()
    wall = time.time()-t0
    cur = workers()
    new = set(cur) - set(prev)
    gone = set(prev) - set(cur)
    du = sum(u for u,s in cur.values()) - sum(u for u,s in prev.values() if True)
    u_tot = sum(u for p,(u,s) in cur.items() if p in prev) - sum(u for p,(u,s) in prev.items() if p in cur)
    s_tot = sum(s for p,(u,s) in cur.items() if p in prev) - sum(s for p,(u,s) in prev.items() if p in cur)
    new_u = sum(cur[p][0] for p in new); new_s = sum(cur[p][1] for p in new)
    print(f"rep {rep}: wall {wall:6.2f}s  workers={len(cur)} new={len(new)} gone={len(gone)} "
          f"survivors u+={u_tot:7.1f} s+={s_tot:6.1f}  newborn u={new_u:7.1f} s={new_s:6.1f}", flush=True)
    prev = cur
