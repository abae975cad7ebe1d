package graft.ebw

import org.apache.spark.ml.linalg.{Vector, Vectors}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Spark-native replacement for the reference examples' use of
 * formulaic.model_matrix (/root/reference/examples/pums_example.py,
 * test_colinear.py): build EBW feature vectors from raw DataFrame columns.
 * Categorical levels become one-hot dummies (SparseVector — the sparse
 * input path of the reference), continuous columns pass through, and
 * `interact` crosses a categorical with variables (the pums_example
 * group-by-state moment structure).
 */
object DesignMatrix {

  /** Distinct sorted levels of a column; nulls are rejected explicitly
   * (the reference's formulaic would error on them too — silently
   * dropping or NPE-ing mid-sort are both worse). */
  private def levels(df: DataFrame, c: String): Array[String] = {
    val raw = df.select(col(c).cast("string")).distinct()
      .collect().map(_.getString(0))
    if (raw.contains(null))
      throw new IllegalArgumentException(
        s"categorical column '$c' contains nulls; fill or filter them first")
    raw.sorted
  }

  /** One-hot encode a single categorical column into a SparseVector
   * features column. Returns (df + featuresCol, sorted level labels).
   * Level vocabulary is collected to the driver — it is the moment
   * dimension k, small by problem construction. */
  def oneHot(df: DataFrame, inputCol: String, featuresCol: String): (DataFrame, Array[String]) = {
    val labels = levels(df, inputCol)
    val idxMap = labels.zipWithIndex.toMap
    val k = labels.length
    val enc = udf { s: String =>
      Vectors.sparse(k, Array(idxMap(s)), Array(1.0)): Vector
    }
    (df.withColumn(featuresCol, enc(col(inputCol).cast("string"))), labels)
  }

  /** Dense design: continuous columns as-is, then one dummy per level of
   * each categorical. Produces array<double> assembled with native
   * (codegen'd) expressions — no UDF. Returns (df + featuresCol, names). */
  def assemble(
      df: DataFrame,
      continuous: Seq[String],
      categoricals: Seq[String],
      featuresCol: String): (DataFrame, Array[String]) = {
    val contCols = continuous.map(c => col(c).cast("double"))
    val catLevels = categoricals.map(c => c -> levels(df, c))
    val dummyCols = catLevels.flatMap { case (c, lv) =>
      lv.map(v => when(col(c).cast("string") === lit(v), 1.0).otherwise(0.0))
    }
    val names = continuous.toArray ++
      catLevels.flatMap { case (c, lv) => lv.map(v => s"$c=$v") }
    (df.withColumn(featuresCol, array(contCols ++ dummyCols: _*)), names)
  }

  /** The pums_example.py moment structure: interact a group column with
   * each variable so that every group's weighted mean of every variable can
   * be targeted (e.g. equalized across groups). Sparse: nnz per row =
   * #variables. Returns (df + featuresCol, names = group x variable). */
  def interact(
      df: DataFrame,
      groupCol: String,
      varCols: Seq[String],
      featuresCol: String): (DataFrame, Array[String]) = {
    val groups = levels(df, groupCol)
    val gIdx = groups.zipWithIndex.toMap
    val nv = varCols.length
    val k = groups.length * nv
    val varsArr = array(varCols.map(c => col(c).cast("double")): _*)
    val enc = udf { (g: String, xs: Seq[Double]) =>
      val base = gIdx(g) * nv
      val idx = Array.tabulate(nv)(base + _)
      Vectors.sparse(k, idx, xs.toArray): Vector
    }
    val names = groups.flatMap(g => varCols.map(v => s"$g:$v"))
    (df.withColumn(featuresCol, enc(col(groupCol).cast("string"), varsArr)), names)
  }

  /**
   * The pums_example.py treatment/control setup in one call: build the
   * design and targets that reweight every group to the SAME weighted means
   * of `varCols` (the overall w0-weighted means), holding each group's
   * total weight fixed. Design = interact(group, 1 +: vars); targets:
   * m(g, const) = W_g / W, m(g, v) = natMean_v * W_g / W.
   * Returns (df + featuresCol, meanMoments, names).
   */
  def equalizeGroups(
      df: DataFrame,
      groupCol: String,
      varCols: Seq[String],
      weightCol: String,
      featuresCol: String): (DataFrame, Array[Double], Array[String]) = {
    val withConst = df.withColumn("__const", lit(1.0))
    val (dfv, names) = interact(withConst, groupCol, "__const" +: varCols, featuresCol)
    val nv = varCols.length + 1
    val w = col(weightCol).cast("double")
    // group totals and national weighted means (small collects: #groups, #vars)
    val wtot = df.agg(sum(w)).collect()(0).getDouble(0)
    val natRow = df.agg(
      varCols.map(v => (sum(col(v).cast("double") * w) / sum(w)).as(v)).head,
      varCols.map(v => (sum(col(v).cast("double") * w) / sum(w)).as(v)).tail: _*)
      .collect()(0)
    val natMeans = Array.tabulate(varCols.length)(natRow.getDouble)
    val gw = df.groupBy(col(groupCol).cast("string").as("g"))
      .agg(sum(w).as("w"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // derive groups the same way interact does — never reverse-parse them
    // out of "group:var" display names (group values may contain ':')
    val groups = levels(df, groupCol)
    val m = new Array[Double](names.length)
    for ((g, gi) <- groups.zipWithIndex) {
      val share = gw(g) / wtot
      m(gi * nv) = share // const moment: keep group total weight
      for (vi <- varCols.indices)
        m(gi * nv + 1 + vi) = natMeans(vi) * share
    }
    (dfv.drop("__const"), m, names)
  }
}
