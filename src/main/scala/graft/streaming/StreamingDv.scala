package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.core.Lake
import graft.dv.{DvOps, HashGen, HashView, LoadContext}
import graft.meta.Transition

/** Streaming Data Vault ingestion (SURVEY §2 #16, #39).
  *
  * The reference is batch-only; the Spark-native engine extends the same
  * load semantics to Structured Streaming:
  *
  *  - [[hubSink]]: micro-batch incremental hub load — each batch runs the
  *    standard hash-view → anti-join-against-existing-hub → bucketed-append
  *    pipeline via foreachBatch, so a stream and a batch backfill produce
  *    byte-identical vault state. Exactly-once per key comes from the
  *    anti-join (idempotent re-delivery: duplicate keys never re-insert),
  *    NOT from sink transactionality — safe under at-least-once delivery.
  *
  *  - [[windowedCounts]]: event-time windowed aggregation with a watermark
  *    bounding state (late rows beyond the watermark are dropped, state for
  *    closed windows is evicted — the 100 TB stream posture).
  */
object StreamingDv {

  /** Wire a streaming staged source into an incremental hub load. Returns a
    * started query writing to `dv/<hubTable>` in the lake. */
  def hubSink(
      lake: Lake,
      staged: DataFrame,
      transitions: Seq[Transition],
      hubTable: String,
      groupName: String,
      bkFields: Seq[(String, String)],
      recordSource: String,
      checkpoint: String,
      algo: HashGen.Algo = HashGen.Sha1
  ): StreamingQuery = {
    val hkName = s"${hubTable.stripPrefix("hub_")}_hk"
    staged.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val ctx = LoadContext(new Timestamp(System.currentTimeMillis()), recordSource, batchId)
        val hv = HashView.build(batch, transitions, algo)
        val existing = lake.readOr("dv", hubTable, StructType(StructField(hkName, StringType) :: Nil))
        val rows = DvOps.newHubRows(hv, existing, groupName, bkFields, hkName, ctx).cache()
        try {
          if (rows.count() > 0) lake.appendBucketed(rows, "dv", hubTable, hkName)
        } finally rows.unpersist()
        ()
      }
      .start()
  }

  /** Event-time tumbling-window counts with a watermark. `tsCol` must be a
    * timestamp column; state is bounded by `delayThreshold`. */
  def windowedCounts(
      events: DataFrame,
      tsCol: String,
      windowDuration: String,
      delayThreshold: String,
      keyCols: String*
  ): DataFrame =
    events
      .withWatermark(tsCol, delayThreshold)
      .groupBy((window(col(tsCol), windowDuration) +: keyCols.map(col)).toIndexedSeq: _*)
      .agg(count(lit(1)).as("n_events"))
      .select(
        (Seq(col("window.start").as("window_start"), col("window.end").as("window_end")) ++
          keyCols.map(col) :+ col("n_events")).toIndexedSeq: _*)
}
