#!/usr/bin/env python3
"""PySpark facade smoke test for the EBW library.

The reference package's users are Python (numpy in, numpy out); this
script proves the adoption loop closes WITHOUT any Python port: a stock
pyspark session with the packaged graft jar on the classpath drives the
MLlib-style estimator (graft.pipeline.EntropyBalanceWeighter) through the
py4j JVM gateway — fit on a poststratification fixture, check
convergence, transform, and verify the reweighted shares hit the targets.

Usage:
    python3 examples/pyspark_ebw.py [path/to/graft.jar]

Exits 0 and prints "PYSPARK-EBW-SMOKE OK" on success (the ScalaTest
smoke spec greps for that line); any assertion failure exits nonzero.
"""
import glob
import os
import sys

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
jars = sorted(glob.glob(os.path.join(repo, "target", "scala-2.13", "*.jar")))
jar = sys.argv[1] if len(sys.argv) > 1 else (jars[-1] if jars else None)
if jar is None:
    sys.exit("no graft jar found; run `sbt package` first or pass a path")

from pyspark.sql import SparkSession  # noqa: E402

builder = (
    SparkSession.builder.master("local[4]")
    .appName("pyspark-ebw-smoke")
    # extraClassPath (jar OR classes directory) is what the py4j gateway
    # resolves graft classes from; spark.jars additionally ships a jar to
    # executors, which local mode does not need but a cluster would
    .config("spark.driver.extraClassPath", jar)
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
)
if jar.endswith(".jar"):
    builder = builder.config("spark.jars", jar)
spark = builder.getOrCreate()
spark.sparkContext.setLogLevel("WARN")

K = 5
N = 2000
onehot = ",".join(
    f"cast(case when id % {K} = {j} then 1.0 else 0.0 end as double)"
    for j in range(K)
)
df = spark.range(N).selectExpr(
    f"cast(id % {K} as int) as g",
    f"array({onehot}) as features",
    "cast(1.0 as double) as w0",
)

# interior, exactly feasible targets (uniform shares perturbed, sum 1)
targets = [0.25, 0.20, 0.20, 0.20, 0.15]
gw = spark.sparkContext._gateway
jtargets = gw.new_array(gw.jvm.double, K)
for i, t in enumerate(targets):
    jtargets[i] = t

est = (
    gw.jvm.graft.pipeline.EntropyBalanceWeighter()
    .setFeaturesCol("features")
    .setWeightCol("w0")
    .setOutputCol("weight_new")
    .setTargetMoments(jtargets)
    .setOptimalityTol(1e-9)
)
model = est.fit(df._jdf)
assert model.converged(), "solver did not converge"
mult = list(model.multipliers())
assert len(mult) == K, f"expected {K} multipliers, got {len(mult)}"

from pyspark.sql import DataFrame  # noqa: E402

out = DataFrame(model.transform(df._jdf), spark)
rows = (
    out.groupBy("g")
    .agg({"weight_new": "sum"})
    .withColumnRenamed("sum(weight_new)", "w")
    .collect()
)
total = sum(r["w"] for r in rows)
shares = {r["g"]: r["w"] / total for r in rows}
for j, t in enumerate(targets):
    got = shares[j]
    assert abs(got - t) < 1e-6, f"group {j}: share {got} vs target {t}"

# probe: invalid input must raise the documented validation error
try:
    bad = spark.range(10).selectExpr(
        f"array({onehot}) as features", "cast(-1.0 as double) as w0"
    )
    est.fit(bad._jdf)
    raise SystemExit("negative w0 must be rejected")
except Exception as e:  # py4j wraps the JVM exception
    assert "Inputs include invalid values" in str(e), str(e)[:300]

print("PYSPARK-EBW-SMOKE OK")
spark.stop()
