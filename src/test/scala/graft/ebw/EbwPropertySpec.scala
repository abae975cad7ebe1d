package graft.ebw

import org.apache.spark.sql.SparkSession
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/**
 * Property-based fuzzing, the analogue of the reference's hypothesis tests
 * (/root/reference/test/test_parametric.py): for random positive problems,
 * entropy_balance either converges — in which case the weighted moments
 * match the targets — or reports failure cleanly; it never throws on
 * validated input.
 */
class EbwPropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("ebw-prop-spec")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private val problemGen: Gen[(Array[Array[Double]], Array[Double], Int)] = for {
    n <- Gen.choose(10, 24)
    k <- Gen.choose(2, 4)
    seed <- Gen.choose(0L, 100000L)
  } yield {
    val rng = new scala.util.Random(seed)
    val x = Array.fill(n)(Array.fill(k)(
      (0.9 + 0.2 * rng.nextDouble()) * (if (rng.nextBoolean()) 1.0 else 0.0)))
    val w0 = Array.fill(n)(0.8 + 0.4 * rng.nextDouble())
    (x, w0, k)
  }

  private def runProp(prop: Prop, n: Int): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, s"property failed: ${res.status}")
  }

  test("feasible targets from an in-sample subpopulation converge and match") {
    runProp(Prop.forAll(problemGen) { case (x, w0, k) =>
      val n = x.length
      val half = n / 2
      val wHalf = (half until n).map(w0).sum
      val m = Array.tabulate(k)(j =>
        (half until n).map(i => w0(i) * x(i)(j)).sum / wHalf)
      val df = spark.createDataFrame(
        x.indices.map(i => (x(i).toSeq, w0(i)))).toDF("feat", "w0")
      val res = EntropyBalance.entropyBalance(df, "feat", "w0", m,
        options = EbwOptions(optimalityTol = 1e-8, maxSteps = 60))
      val sumW = w0.sum
      // converged => moments match; not converged is allowed (degenerate
      // hulls) as long as it was REPORTED, not thrown
      !res.converged || res.constraintViolations.zipWithIndex.forall {
        case (v, j) => math.abs(v) < 1e-4 * math.max(1.0, math.abs(m(j)) * sumW)
      }
    }, 12)
  }

  test("weights stay positive and finite whenever the solver converges") {
    runProp(Prop.forAll(problemGen) { case (x, w0, k) =>
      val n = x.length
      val m = Array.tabulate(k)(j => x.map(_(j)).sum / n)
      val df = spark.createDataFrame(
        x.indices.map(i => (x(i).toSeq, w0(i)))).toDF("feat", "w0")
      val res = EntropyBalance.entropyBalance(df, "feat", "w0", m,
        options = EbwOptions(maxSteps = 40))
      !res.converged || {
        val ws = res.weighted.select("weight_new").collect().map(_.getDouble(0))
        ws.forall(w => w > 0.0 && !w.isInfinite && !w.isNaN)
      }
    }, 8)
  }
}
