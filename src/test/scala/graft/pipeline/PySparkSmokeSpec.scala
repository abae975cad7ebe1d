package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

/**
 * Adoption-loop smoke: the reference's users are Python, so the facade
 * must be drivable from stock pyspark with no Python port — the spec
 * shells out to examples/pyspark_ebw.py, which fits
 * EntropyBalanceWeighter through the py4j JVM gateway on a poststrat
 * fixture, transforms, checks the reweighted shares hit the targets, and
 * probes the validation error across the language boundary. Skips
 * (assume) where pyspark is not importable, so the suite stays green on
 * JVM-only machines.
 */
class PySparkSmokeSpec extends AnyFunSuite {

  test("pyspark drives EntropyBalanceWeighter via the JVM gateway " +
    "(fit, converged, transform, shares == targets, error probe)") {
    import scala.sys.process._
    val probe =
      try Process(Seq("python3", "-c", "import pyspark"))
        .!(ProcessLogger(_ => (), _ => ()))
      catch { case _: java.io.IOException => 127 }
    assume(probe == 0, "python3+pyspark not available on this machine")
    val classes = new java.io.File("target/scala-2.13/classes").getAbsolutePath
    val script = new java.io.File("examples/pyspark_ebw.py").getAbsolutePath
    val out = new StringBuilder
    val log = ProcessLogger(s => out.append(s).append('\n'),
      s => out.append(s).append('\n'))
    val code = Process(Seq("python3", script, classes)).!(log)
    assert(code == 0, s"smoke script exit $code:\n${out.toString.takeRight(3000)}")
    assert(out.toString.contains("PYSPARK-EBW-SMOKE OK"),
      s"missing OK line:\n${out.toString.takeRight(3000)}")
  }
}
