package graft.pipeline

import org.apache.spark.ml.{Estimator, Model}
import org.apache.spark.ml.param._
import org.apache.spark.ml.param.shared.{HasFeaturesCol, HasOutputCol, HasWeightCol}
import org.apache.spark.ml.util.Identifiable
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.types.{DoubleType, StructField, StructType}

import graft.ebw.{EbwOptions, EbwResult, EntropyBalance}

/**
 * MLlib Pipeline integration (the "north star" packaging): entropy balance
 * weighting as an Estimator so it composes with RFormula/VectorAssembler/
 * Pipeline. fit() runs the solver; the resulting Model is a lightweight
 * transformer that appends the reweighted column from the learned k-dim
 * multipliers — transform() is a single narrow pass, no solver state.
 */
class EntropyBalanceWeighter(override val uid: String)
    extends Estimator[EntropyBalanceModel]
    with HasFeaturesCol with HasWeightCol with HasOutputCol {

  def this() = this(Identifiable.randomUID("ebw"))

  final val targetMoments: DoubleArrayParam =
    new DoubleArrayParam(this, "targetMoments", "mean population moments")
  final val lowerBound: DoubleParam =
    new DoubleParam(this, "lowerBound", "ratio lower bound")
  final val upperBound: DoubleParam =
    new DoubleParam(this, "upperBound", "ratio upper bound")
  final val maxSteps: IntParam = new IntParam(this, "maxSteps", "max Newton steps")
  final val optimalityTol: DoubleParam =
    new DoubleParam(this, "optimalityTol", "relative optimality tolerance")

  setDefault(outputCol -> "weight_new", maxSteps -> 30, optimalityTol -> 1e-5)

  def setFeaturesCol(v: String): this.type = set(featuresCol, v)
  def setWeightCol(v: String): this.type = set(weightCol, v)
  def setOutputCol(v: String): this.type = set(outputCol, v)
  def setTargetMoments(v: Array[Double]): this.type = set(targetMoments, v)
  def setBounds(lb: Double, ub: Option[Double]): this.type = {
    set(lowerBound, lb)
    ub.foreach(u => set(upperBound, u))
    this
  }
  def setMaxSteps(v: Int): this.type = set(maxSteps, v)
  def setOptimalityTol(v: Double): this.type = set(optimalityTol, v)

  override def fit(dataset: Dataset[_]): EntropyBalanceModel = {
    val bounds =
      if (isSet(lowerBound) || isSet(upperBound))
        Some((if (isSet(lowerBound)) $(lowerBound) else 0.0,
          if (isSet(upperBound)) Some($(upperBound)) else None))
      else None
    val res = EntropyBalance.entropyBalance(
      dataset.toDF(), $(featuresCol), $(weightCol), $(targetMoments),
      $(outputCol),
      EbwOptions(maxSteps = $(maxSteps), optimalityTol = $(optimalityTol),
        bounds = bounds))
    val model = new EntropyBalanceModel(uid, res).setParent(this)
    copyValues(model)
  }

  override def copy(extra: ParamMap): EntropyBalanceWeighter =
    defaultCopy(extra)

  override def transformSchema(schema: StructType): StructType =
    StructType(schema.fields :+ StructField($(outputCol), DoubleType, nullable = false))
}

class EntropyBalanceModel(override val uid: String, val result: EbwResult)
    extends Model[EntropyBalanceModel]
    with HasFeaturesCol with HasWeightCol with HasOutputCol {

  def converged: Boolean = result.converged
  def multipliers: Array[Double] = result.equalityMultipliers

  override def transform(dataset: Dataset[_]): DataFrame = {
    // Re-derive the ratio column on the new dataset from the learned
    // multipliers — the Spark analogue of applying saved calibration
    // weights to fresh data.
    import graft.ebw.EbwAccess
    EbwAccess.applyWeights(result, dataset.toDF(), $(featuresCol), $(weightCol), $(outputCol))
  }

  override def copy(extra: ParamMap): EntropyBalanceModel =
    copyValues(new EntropyBalanceModel(uid, result)).setParent(parent)

  override def transformSchema(schema: StructType): StructType =
    StructType(schema.fields :+ StructField($(outputCol), DoubleType, nullable = false))
}
