package graft.pipeline

import org.apache.spark.ml.{Estimator, Model}
import org.apache.spark.ml.param._
import org.apache.spark.ml.param.shared.{HasFeaturesCol, HasOutputCol, HasWeightCol}
import org.apache.spark.ml.util.Identifiable
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.types.{DoubleType, StructField, StructType}

import graft.ebw.{EbwOptions, EbwResult, EntropyBalance, GroupedEntropyBalance}
import graft.ebw.GroupedEntropyBalance.GroupResult

/** Learned state of a grouped fit: effective per-group multipliers plus
 * the ratio box they were solved under — everything transform needs to
 * re-derive `w0 * clip(exp(x . mult_g), lb, ub)` on fresh data. */
final case class GroupedWeighterState(
    groupCol: String,
    groups: Map[String, GroupResult],
    lb: Double,
    ub: Double) {
  def allConverged: Boolean = groups.values.forall(_.converged)
}

/**
 * MLlib Pipeline integration (the "north star" packaging): entropy balance
 * weighting as an Estimator so it composes with RFormula/VectorAssembler/
 * Pipeline. fit() runs the solver; the resulting Model is a lightweight
 * transformer that appends the reweighted column from the learned k-dim
 * multipliers — transform() is a single narrow pass, no solver state.
 *
 * Grouped mode: set `groupCol` + `groupTargets` to solve one independent
 * problem per group value (GroupedEntropyBalance — per-source / per-domain
 * recalibration) inside the same Pipeline; transform then routes each row
 * through its own group's multipliers.
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
  final val groupCol: Param[String] =
    new Param[String](this, "groupCol", "column defining independent problems")
  final val groupTargets: Param[Map[String, Array[Double]]] =
    new Param[Map[String, Array[Double]]](this, "groupTargets",
      "per-group mean population moments (grouped mode)")
  final val penalty: DoubleArrayParam =
    new DoubleArrayParam(this, "penalty",
      "quadratic penalty per moment (length 1 broadcasts to all k); " +
      "when set, fit solves the penalty variant instead of exact balance")

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
  def setGroupCol(v: String): this.type = set(groupCol, v)
  def setGroupTargets(v: Map[String, Array[Double]]): this.type = set(groupTargets, v)
  def setPenalty(v: Array[Double]): this.type = set(penalty, v)

  /** Java/py4j-friendly bounds setter (the Python façade can't build
   * scala.Option): pass Double.PositiveInfinity for "no upper bound". */
  def setRatioBounds(lb: Double, ub: Double): this.type = {
    set(lowerBound, lb)
    if (!ub.isInfinite) set(upperBound, ub)
    this
  }

  /** Java/py4j-friendly grouped-targets setter (the Python façade can't
   * build a scala.collection.immutable.Map). */
  def setGroupTargetsJava(
      v: java.util.Map[String, Array[Double]]): this.type = {
    import scala.jdk.CollectionConverters._
    set(groupTargets, v.asScala.toMap)
  }

  override def fit(dataset: Dataset[_]): EntropyBalanceModel = {
    val bounds =
      if (isSet(lowerBound) || isSet(upperBound))
        Some((if (isSet(lowerBound)) $(lowerBound) else 0.0,
          if (isSet(upperBound)) Some($(upperBound)) else None))
      else None
    val options = EbwOptions(maxSteps = $(maxSteps),
      optimalityTol = $(optimalityTol), bounds = bounds)
    val model =
      if (isSet(groupCol)) {
        require(isSet(groupTargets),
          "grouped mode (groupCol set) requires groupTargets")
        val res =
          if (isSet(penalty))
            GroupedEntropyBalance.entropyBalancePenaltyGrouped(
              dataset.toDF(), $(groupCol), $(featuresCol), $(weightCol),
              $(groupTargets), $(penalty), $(outputCol), options)
          else GroupedEntropyBalance.entropyBalanceGrouped(
            dataset.toDF(), $(groupCol), $(featuresCol), $(weightCol),
            $(groupTargets), $(outputCol), options)
        val (lb, ub) = bounds match {
          case Some((l, u)) =>
            (math.max(0.0, l), u.getOrElse(Double.PositiveInfinity))
          case None => (0.0, Double.PositiveInfinity)
        }
        new EntropyBalanceModel(uid, None,
          Some(GroupedWeighterState($(groupCol), res.groups, lb, ub)))
      } else {
        val res =
          if (isSet(penalty)) EntropyBalance.entropyBalancePenalty(
            dataset.toDF(), $(featuresCol), $(weightCol), $(targetMoments),
            $(penalty), $(outputCol), options)
          else EntropyBalance.entropyBalance(
            dataset.toDF(), $(featuresCol), $(weightCol), $(targetMoments),
            $(outputCol), options)
        new EntropyBalanceModel(uid, Some(res), None)
      }
    copyValues(model.setParent(this))
  }

  override def copy(extra: ParamMap): EntropyBalanceWeighter =
    defaultCopy(extra)

  override def transformSchema(schema: StructType): StructType =
    StructType(schema.fields :+ StructField($(outputCol), DoubleType, nullable = false))
}

class EntropyBalanceModel private[pipeline] (
    override val uid: String,
    private val singleResult: Option[EbwResult],
    val groupedState: Option[GroupedWeighterState])
    extends Model[EntropyBalanceModel]
    with HasFeaturesCol with HasWeightCol with HasOutputCol {

  /** Single-problem constructor (the original public shape). */
  def this(uid: String, result: EbwResult) = this(uid, Some(result), None)

  def isGrouped: Boolean = groupedState.isDefined

  /** Single-mode solver result; throws in grouped mode (use groupedState). */
  def result: EbwResult = singleResult.getOrElse(
    throw new IllegalStateException(
      "grouped model has per-group results; see groupedState"))

  def converged: Boolean =
    groupedState.map(_.allConverged).getOrElse(result.converged)

  /** Single-mode multipliers; grouped models have one vector per group. */
  def multipliers: Array[Double] =
    if (isGrouped)
      throw new IllegalStateException(
        "grouped model has per-group multipliers; use " +
          "groupedState.get.groups(<group>).multipliers")
    else result.equalityMultipliers

  override def transform(dataset: Dataset[_]): DataFrame = {
    // Re-derive the ratio column on the new dataset from the learned
    // multipliers — the Spark analogue of applying saved calibration
    // weights to fresh data.
    import graft.ebw.EbwAccess
    groupedState match {
      case Some(gs) =>
        GroupedEntropyBalance.applyGroupWeights(dataset.toDF(), gs.groupCol,
          $(featuresCol), $(weightCol), $(outputCol), gs.groups, gs.lb, gs.ub)
      case None =>
        EbwAccess.applyWeights(result, dataset.toDF(), $(featuresCol),
          $(weightCol), $(outputCol))
    }
  }

  override def copy(extra: ParamMap): EntropyBalanceModel =
    copyValues(new EntropyBalanceModel(uid, singleResult, groupedState))
      .setParent(parent)

  override def transformSchema(schema: StructType): StructType =
    StructType(schema.fields :+ StructField($(outputCol), DoubleType, nullable = false))
}
