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

# ---- elastic bounds (the reference's bounded mode, feasible case) ----
# setRatioBounds is the py4j-friendly setter (no scala.Option needed);
# feasible targets => exact balance with every ratio inside [0.5, 2.5]
best = (
    gw.jvm.graft.pipeline.EntropyBalanceWeighter()
    .setFeaturesCol("features")
    .setWeightCol("w0")
    .setOutputCol("weight_new")
    .setTargetMoments(jtargets)
    .setRatioBounds(0.5, 2.5)
    .setOptimalityTol(1e-9)
)
bmodel = best.fit(df._jdf)
assert bmodel.converged(), "bounded solver did not converge"
bout = DataFrame(bmodel.transform(df._jdf), spark)
ratios = bout.selectExpr("min(weight_new / w0)", "max(weight_new / w0)").collect()[0]
assert ratios[0] >= 0.5 - 1e-9 and ratios[1] <= 2.5 + 1e-9, str(ratios)
brows = (
    bout.groupBy("g").agg({"weight_new": "sum"})
    .withColumnRenamed("sum(weight_new)", "w").collect()
)
btotal = sum(r["w"] for r in brows)
for j, t in enumerate(targets):
    got = {r["g"]: r["w"] / btotal for r in brows}[j]
    assert abs(got - t) < 1e-6, f"bounded group {j}: {got} vs {t}"

# ---- quadratic penalty (entropy_balance_penalty semantics) ----
# a large penalty approaches exact balance; a small one stays near w0.
jpen = gw.new_array(gw.jvm.double, 1)
jpen[0] = 1e6
pest = (
    gw.jvm.graft.pipeline.EntropyBalanceWeighter()
    .setFeaturesCol("features")
    .setWeightCol("w0")
    .setOutputCol("weight_new")
    .setTargetMoments(jtargets)
    .setPenalty(jpen)
)
pmodel = pest.fit(df._jdf)
assert pmodel.converged(), "penalty solver did not converge"
pout = DataFrame(pmodel.transform(df._jdf), spark)
prows = (
    pout.groupBy("g").agg({"weight_new": "sum"})
    .withColumnRenamed("sum(weight_new)", "w").collect()
)
ptotal = sum(r["w"] for r in prows)
for j, t in enumerate(targets):
    got = {r["g"]: r["w"] / ptotal for r in prows}[j]
    assert abs(got - t) < 1e-3, f"penalty group {j}: {got} vs {t}"

# ---- grouped mode (one independent problem per group value) ----
# two strata, each balanced to ITS OWN 2-moment target; the java Map
# setter is the py4j path (no scala.collection construction in Python)
gdf = spark.range(N).selectExpr(
    "case when id % 2 = 0 then 'even' else 'odd' end as stratum",
    "array(cast(case when id % 4 < 2 then 1.0 else 0.0 end as double),"
    " cast(case when id % 4 >= 2 then 1.0 else 0.0 end as double))"
    " as features",
    "cast(1.0 as double) as w0",
)
jmap = gw.jvm.java.util.HashMap()
for name, tgt in (("even", [0.6, 0.4]), ("odd", [0.3, 0.7])):
    arr = gw.new_array(gw.jvm.double, 2)
    arr[0], arr[1] = tgt
    jmap.put(name, arr)
gest = (
    gw.jvm.graft.pipeline.EntropyBalanceWeighter()
    .setFeaturesCol("features")
    .setWeightCol("w0")
    .setOutputCol("weight_new")
    .setGroupCol("stratum")
    .setGroupTargetsJava(jmap)
    .setOptimalityTol(1e-9)
)
gmodel = gest.fit(gdf._jdf)
assert gmodel.converged(), "grouped solver did not converge"
gout = DataFrame(gmodel.transform(gdf._jdf), spark)
grows = (
    gout.selectExpr(
        "stratum",
        "case when features[0] = 1.0 then 0 else 1 end as cell",
        "weight_new",
    )
    .groupBy("stratum", "cell").agg({"weight_new": "sum"})
    .withColumnRenamed("sum(weight_new)", "w").collect()
)
bys = {}
for r in grows:
    bys.setdefault(r["stratum"], {})[r["cell"]] = r["w"]
for name, tgt in (("even", [0.6, 0.4]), ("odd", [0.3, 0.7])):
    tot = sum(bys[name].values())
    for c, t in enumerate(tgt):
        got = bys[name][c] / tot
        assert abs(got - t) < 1e-6, f"grouped {name}/{c}: {got} vs {t}"

print("PYSPARK-EBW-SMOKE OK")
spark.stop()
