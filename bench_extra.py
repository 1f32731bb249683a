"""Extra benchmarks (r6): noop-sink isolated per-query timing (guide §1.4).

NOT the driver contract — bench.py is frozen for measurement.  This
harness exists so individual queries (declared or engine-scale bench
closures) can be timed in isolation with the same methodology bench.py
uses (noop sink, 3 runs, discard run 1, min of runs 2-3) while iterating
on an optimization.  Usage:

    SF_DIR=/root/testdata/sf1.0 CPUS=32 python bench_extra.py lang_id \
        minhash_near_dups_200k ...

Engine-scale names (minhash_near_dups_200k, text_ann_200k, ...) rebuild
the exact DataFrames bench.py builds via tools/capture_plans.bench_frames;
any other name resolves from __spark_entry__.queries() at $SF_DIR.
"""
import os, sys, time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
os.chdir(REPO)
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

SF = os.environ.get("SF_DIR", "/root/testdata/sf1.0")
cpus = int(os.environ.get("CPUS", "32"))
from dff.env import pick_local_dir
mem = "16g"
b = SparkSession.builder.master(f"local[{cpus}]").appName("tq")
ld = pick_local_dir()
if ld: b = b.config("spark.local.dir", ld)
spark = (b.config("spark.sql.shuffle.partitions", str(2*cpus))
 .config("spark.sql.adaptive.enabled","true")
 .config("spark.sql.execution.arrow.pyspark.enabled","true")
 .config("spark.driver.memory", mem)
 .config("spark.driver.extraJavaOptions", f"-Xms{mem} -XX:+AlwaysPreTouch")
 .config("spark.sql.files.maxPartitionBytes","33554432")
 .config("spark.ui.enabled","false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as entry
qdict = entry.queries()
sys.path.insert(0, os.path.join(REPO, "tools"))
from capture_plans import bench_frames
bench = bench_frames(spark)

def noop(df): df.write.format("noop").mode("overwrite").save()
# python-worker warm
from pyspark.sql.pandas.functions import pandas_udf
_warm = pandas_udf(lambda v: v*1.0, "double")
noop(spark.range(cpus*4).repartition(cpus*2).select(_warm(F.col("id").cast("double")).alias("v")))

names = sys.argv[1:]
for name in names:
    fn = bench.get(name) or (lambda n=name: qdict[n](spark, SF))
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        noop(fn())
        runs.append(round(time.perf_counter()-t0, 3))
    print(f"{name:32s} min23={min(runs[1:]):7.3f}  runs={runs}", flush=True)
spark.stop()
