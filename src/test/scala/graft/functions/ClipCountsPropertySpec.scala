package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/**
 * Property fuzz for the `graft_clip_counts` kernel: all three forms
 * (word arrays, in-kernel tokenization, char grams) against a naive
 * reference implementation built on plain Scala collections — across
 * random token multisets (small vocab, heavy repeats — the clipping
 * stress), messy whitespace, mixed case, empty sides, and non-ASCII
 * text. Exercises the kernel DIRECTLY (no Spark session needed): the
 * Catalyst plumbing is covered by FunctionsSpec/TextEvalSpec.
 */
class ClipCountsPropertySpec extends AnyFunSuite {

  private def naive(c: Seq[String], r: Seq[String], n: Int): (Long, Long, Long) = {
    def grams(t: Seq[String]): Seq[Seq[String]] =
      if (t.length < n) Nil else t.sliding(n).toSeq
    val cg = grams(c)
    val rg = grams(r)
    val rc = scala.collection.mutable.Map.empty[Seq[String], Long]
    rg.foreach(g => rc(g) = rc.getOrElse(g, 0L) + 1L)
    val cc = scala.collection.mutable.Map.empty[Seq[String], Long]
    cg.foreach(g => cc(g) = cc.getOrElse(g, 0L) + 1L)
    val clip = cc.map { case (g, k) => math.min(k, rc.getOrElse(g, 0L)) }.sum
    (cg.length.toLong, rg.length.toLong, clip)
  }

  private def kernelRows(a: ArrayData): Seq[(Int, Long, Long, Long)] =
    (0 until a.numElements()).map { i =>
      val row = a.getStruct(i, 4)
      (row.getInt(0), row.getLong(1), row.getLong(2), row.getLong(3))
    }

  private def arr(t: Seq[String]): ArrayData =
    new GenericArrayData(t.map(s => UTF8String.fromString(s)).toArray[Any])

  private val vocab = Gen.oneOf("a", "b", "ab", "ba", "the", "x1",
    "émile", "白", "😀", "z")

  private val toksGen: Gen[Seq[String]] =
    Gen.choose(0, 30).flatMap(k => Gen.listOfN(k, vocab))

  private def check(prop: Prop, name: String): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, s"$name: $res")
  }

  test("word form == naive clipped counts on random token multisets") {
    check(Prop.forAll(toksGen, toksGen, Gen.choose(1, 4)) { (c, r, maxN) =>
      val got = kernelRows(ClipCountsKernel.counts(arr(c), arr(r), 1, maxN))
      got.length == maxN && got.zipWithIndex.forall { case ((n, cc, rc, cl), i) =>
        n == i + 1 && (cc, rc, cl) == naive(c, r, n)
      }
    }, "word form")
  }

  test("tokens form == lowercase-whitespace-split word form, any " +
    "whitespace mess") {
    val ws = Gen.oneOf(" ", "  ", "\t", "\n", " \r\n ")
    val textGen: Gen[String] = for {
      t <- toksGen
      seps <- Gen.listOfN(t.length + 1, ws)
      upper <- Gen.oneOf(true, false)
    } yield {
      val s = seps.head + t.zip(seps.tail).map { case (w, sp) => w + sp }.mkString
      if (upper) s.toUpperCase else s
    }
    check(Prop.forAll(textGen, textGen, Gen.choose(1, 3)) { (c, r, maxN) =>
      def toks(s: String): Seq[String] =
        s.toLowerCase.split("\\s+").toSeq.filter(_.nonEmpty)
      val viaTokens = kernelRows(ClipCountsKernel.tokenCounts(
        UTF8String.fromString(c), UTF8String.fromString(r), 1, maxN))
      val viaArrays = kernelRows(ClipCountsKernel.counts(
        arr(toks(c)), arr(toks(r)), 1, maxN))
      viaTokens == viaArrays
    }, "tokens form")
  }

  test("char form == naive over UTF-16 unit grams") {
    val strGen = Gen.choose(0, 40).flatMap(k =>
      Gen.listOfN(k, Gen.oneOf('a', 'b', 'c', ' ', 'é', '白'))).map(_.mkString)
    check(Prop.forAll(strGen, strGen, Gen.choose(1, 5)) { (c, r, maxN) =>
      val got = kernelRows(ClipCountsKernel.charCounts(
        UTF8String.fromString(c), UTF8String.fromString(r), 1, maxN))
      got.zipWithIndex.forall { case ((n, cc, rc, cl), i) =>
        n == i + 1 &&
          (cc, rc, cl) == naive(c.map(_.toString), r.map(_.toString), n)
      }
    }, "char form")
  }

  test("clip is symmetric-bounded: clip <= min(cc, rc), and equal " +
    "multisets clip fully") {
    check(Prop.forAll(toksGen, toksGen) { (c, r) =>
      val rows = kernelRows(ClipCountsKernel.counts(arr(c), arr(r), 1, 2))
      val bounded = rows.forall { case (_, cc, rc, cl) =>
        cl <= math.min(cc, rc) && cl >= 0
      }
      val selfRows = kernelRows(ClipCountsKernel.counts(arr(c), arr(c), 1, 2))
      bounded && selfRows.forall { case (_, cc, rc, cl) =>
        cc == rc && cl == cc
      }
    }, "clip bounds")
  }
}
