package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ebw.{EbwOptions, EntropyBalance}

/**
 * Streaming recalibration: re-solve the entropy balance problem on each
 * micro-batch and append the reweighted rows to a parquet sink. The
 * foreachBatch pattern is the standard Spark way to run an iterative /
 * ML-style computation inside a streaming pipeline — each micro-batch is
 * a bounded DataFrame, so the full batch solver applies unchanged.
 */
object StreamingWeighter {

  def start(
      stream: DataFrame,
      featuresCol: String,
      weightCol: String,
      meanPopulationMoments: Array[Double],
      sinkPath: String,
      checkpointPath: String,
      options: EbwOptions = EbwOptions()): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val res = EntropyBalance.entropyBalance(
            batch, featuresCol, weightCol, meanPopulationMoments,
            options = options)
          res.weighted
            .withColumn("batch_id", org.apache.spark.sql.functions.lit(batchId))
            .withColumn("converged", org.apache.spark.sql.functions.lit(res.converged))
            .write.mode("append").parquet(sinkPath)
        }
      }
      .start()
}
