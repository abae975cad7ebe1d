package graft.ebw

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Problem persistence, the Spark-native analogue of
 * dump_problem_to_zip/load_problem_from_zip
 * (/root/reference/entropy_balance_weighting/shared.py:136-170). The
 * reference writes .npy/.npz into a zip; at cluster scale the natural
 * container is a parquet directory: `data/` holds (idx, vals, w0) rows
 * (sparse iff idx non-null), `meta/` holds the target moments.
 */
object ProblemIO {

  def save(
      df: DataFrame, featuresCol: String, weightCol: String,
      moments: Array[Double], path: String): Unit = {
    val k = moments.length
    val prep = EntropyBalance.prepare(df, featuresCol, weightCol, k, moments)
    try saveRows(df.sparkSession, prep.rows, moments, path)
    finally prep.rows.unpersist(false)
  }

  /** Dump an already-prepared (cached, validated) row RDD — used by the
   * solvers' save_problem_data/save_failure_data hooks so the dump reuses
   * the solve's own cached projection instead of re-preparing and
   * re-validating the input. */
  private[ebw] def saveRows(
      spark: SparkSession, rows: org.apache.spark.rdd.RDD[EbwRow],
      moments: Array[Double], path: String): Unit = {
    import spark.implicits._
    rows.map(r => (Option(r.idx), Option(r.vals).getOrElse(Array.empty[Double]).toSeq, r.w0))
      .toDF("idx", "vals", "w0")
      .write.mode("overwrite").parquet(s"$path/data")
    Seq((moments.toSeq, moments.length)).toDF("moments", "k")
      .write.mode("overwrite").parquet(s"$path/meta")
  }

  /**
   * Reference-interop dump: writes the exact zip-of-npy/npz layout of
   * `dump_problem_to_zip` (shared.py:136-155) — `moments.npy`, `w0.npy`,
   * and `x.npy` (dense, C-order float64) or `x.npz` (scipy save_npz CSR:
   * format/shape/data/indices/indptr entries) — so a problem dumped here
   * replays in the reference Python package and vice versa. This format is
   * inherently single-node (the reference collects the full N x K matrix
   * into one file); use the parquet `save` for cluster-scale persistence.
   */
  def saveReferenceZip(
      df: DataFrame, featuresCol: String, weightCol: String,
      moments: Array[Double], zipPath: String): Unit = {
    val k = moments.length
    val prep = EntropyBalance.prepare(df, featuresCol, weightCol, k, moments)
    val rows =
      try prep.rows.collect()
      finally prep.rows.unpersist(false)
    val n = rows.length
    val anySparse = rows.exists(_.idx != null)
    val xEntry: (String, Array[Byte]) =
      if (!anySparse) {
        require(n.toLong * k <= (Int.MaxValue.toLong - 4096) / 8,
          s"dense $n x $k problem is too large for the single-node " +
            "reference zip format; use ProblemIO.save (parquet) instead")
        val flat = new Array[Double](n * k)
        var i = 0
        while (i < n) {
          System.arraycopy(rows(i).vals, 0, flat, i * k, k)
          i += 1
        }
        "x.npy" -> NpyIO.writeDoubles(flat, Seq(n.toLong, k.toLong))
      } else {
        // CSR: scipy save_npz layout (an inner zip of npy entries)
        val nnz = rows.iterator.map(r =>
          if (r.idx != null) r.idx.length else r.vals.count(_ != 0.0)).sum
        val data = new Array[Double](nnz)
        val indices = new Array[Long](nnz)
        val indptr = new Array[Long](n + 1)
        var p = 0
        var i = 0
        while (i < n) {
          val r = rows(i)
          if (r.idx != null) {
            var q = 0
            while (q < r.idx.length) {
              data(p) = r.vals(q); indices(p) = r.idx(q).toLong; p += 1; q += 1
            }
          } else {
            var j = 0
            while (j < k) {
              if (r.vals(j) != 0.0) { data(p) = r.vals(j); indices(p) = j.toLong; p += 1 }
              j += 1
            }
          }
          indptr(i + 1) = p
          i += 1
        }
        val inner = NpyIO.writeZip(Seq(
          "format.npy" -> NpyIO.writeByteString("csr"),
          "shape.npy" -> NpyIO.writeLongs(Array(n.toLong, k.toLong), Seq(2L)),
          "data.npy" -> NpyIO.writeDoubles(data, Seq(nnz.toLong)),
          "indices.npy" -> NpyIO.writeLongs(indices, Seq(nnz.toLong)),
          "indptr.npy" -> NpyIO.writeLongs(indptr, Seq(n + 1L))))
        "x.npz" -> inner
      }
    val zip = NpyIO.writeZip(Seq(
      "moments.npy" -> NpyIO.writeDoubles(moments, Seq(k.toLong)),
      xEntry,
      "w0.npy" -> NpyIO.writeDoubles(rows.map(_.w0), Seq(n.toLong))))
    java.nio.file.Files.write(java.nio.file.Paths.get(zipPath), zip)
  }

  /** Load a reference `dump_problem_to_zip` file (shared.py:157-170).
   * Returns (df with features/w0 columns, moments): dense x.npy comes back
   * as array<double> features, sparse x.npz (csr or csc) as ml
   * SparseVector. */
  def loadReferenceZip(
      spark: SparkSession, zipPath: String): (DataFrame, Array[Double]) = {
    import org.apache.spark.ml.linalg.{Vector, Vectors}
    val entries = NpyIO.readZip(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(zipPath)))
    val moments = NpyIO.read(entries("moments.npy")).toDoubles
    val w0 = NpyIO.read(entries("w0.npy")).toDoubles
    val df =
      if (entries.contains("x.npy")) {
        val x = NpyIO.read(entries("x.npy"))
        require(x.shape.length == 2, "x.npy must be 2-D")
        val n = x.shape(0).toInt
        val k = x.shape(1).toInt
        require(w0.length == n, "w0 length must match x rows")
        val flat = x.toDoubles
        val rows = (0 until n).map { i =>
          val v = new Array[Double](k)
          var j = 0
          while (j < k) {
            v(j) = if (x.fortran) flat(j * n + i) else flat(i * k + j)
            j += 1
          }
          (v.toSeq, w0(i))
        }
        spark.createDataFrame(rows).toDF("features", "w0")
      } else {
        val inner = NpyIO.readZip(entries("x.npz"))
        val fmt = NpyIO.read(inner("format.npy")).toByteString
        val shape = NpyIO.read(inner("shape.npy")).toLongs
        val (n, k) = (shape(0).toInt, shape(1).toInt)
        require(w0.length == n, "w0 length must match x rows")
        val data = NpyIO.read(inner("data.npy")).toDoubles
        val indices = NpyIO.read(inner("indices.npy")).toLongs
        val indptr = NpyIO.read(inner("indptr.npy")).toLongs
        val perRow = Array.fill(n)(scala.collection.mutable.ArrayBuffer[(Int, Double)]())
        fmt match {
          case "csr" =>
            var i = 0
            while (i < n) {
              var p = indptr(i).toInt
              while (p < indptr(i + 1)) { perRow(i) += ((indices(p).toInt, data(p))); p += 1 }
              i += 1
            }
          case "csc" =>
            var j = 0
            while (j < k) {
              var p = indptr(j).toInt
              while (p < indptr(j + 1)) { perRow(indices(p).toInt) += ((j, data(p))); p += 1 }
              j += 1
            }
          case other =>
            throw new IllegalArgumentException(s"unsupported sparse format: $other")
        }
        val rows = (0 until n).map { i =>
          val sorted = perRow(i).sortBy(_._1)
          (Vectors.sparse(k, sorted.map(_._1).toArray, sorted.map(_._2).toArray): Vector,
        w0(i))
        }
        spark.createDataFrame(rows).toDF("features", "w0")
      }
    (df, moments)
  }

  /** Returns (df with featuresCol/weightCol, moments). Dense problems come
   * back as array<double> features; sparse ones as ml SparseVector. */
  def load(spark: SparkSession, path: String): (DataFrame, Array[Double]) = {
    val meta = spark.read.parquet(s"$path/meta").collect()(0)
    val moments = meta.getSeq[Double](0).toArray
    val k = meta.getInt(1)
    val data = spark.read.parquet(s"$path/data")
    val anySparse = data.filter(col("idx").isNotNull).limit(1).count() > 0
    val df =
      if (!anySparse) data.select(col("vals").as("features"), col("w0"))
      else {
        import org.apache.spark.ml.linalg.{Vector, Vectors}
        val toVec = udf { (idx: Seq[Int], vals: Seq[Double]) =>
          if (idx == null) Vectors.dense(vals.toArray)
          else Vectors.sparse(k, idx.toArray, vals.toArray): Vector
        }
        data.select(toVec(col("idx"), col("vals")).as("features"), col("w0"))
      }
    (df, moments)
  }
}
