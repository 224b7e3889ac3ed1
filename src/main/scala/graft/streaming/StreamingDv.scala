package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
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

  /** Per-stream shuffle/state partition sizing for the micro-batch plans.
    * Streaming tasks pay a FIXED per-task setup (state/codegen init, commit
    * files) that dominates under-filled partitions: BASELINE.md's r12 A/B
    * ladder measured the session default (32) wasting ~25× the needed setup
    * on a 40k-key replay — 8 partitions cut the streaming family floor
    * 18.2 → 13.0 s with identical results. Size to the stream's KEY
    * CARDINALITY (aim ≥ ~10⁵ keys or ≥ tens of MB of state per partition),
    * not to the cluster's core count. Applied inside foreachBatch on the
    * stream's CLONED session (Structured Streaming snapshots the session at
    * start), so it scopes to this query and never leaks to the caller's
    * session. None (default) keeps the session conf. */
  private def sizeBatch(batch: DataFrame, statePartitions: Option[Int]): Unit =
    statePartitions.foreach { n =>
      require(n > 0, s"statePartitions must be > 0, got $n")
      batch.sparkSession.conf.set("spark.sql.shuffle.partitions", n)
    }

  /** Wire a streaming staged source into an incremental hub load. Returns a
    * started query writing to `dv/<hubTable>` in the lake.
    * `statePartitions`: see [[sizeBatch]]. */
  def hubSink(
      lake: Lake,
      staged: DataFrame,
      transitions: Seq[Transition],
      hubTable: String,
      groupName: String,
      bkFields: Seq[(String, String)],
      recordSource: String,
      checkpoint: String,
      algo: HashGen.Algo = HashGen.Sha1,
      loadDts: Option[Timestamp] = None,
      statePartitions: Option[Int] = None
  ): StreamingQuery = {
    val hkName = s"${hubTable.stripPrefix("hub_")}_hk"
    staged.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sizeBatch(batch, statePartitions)
        val ctx = LoadContext(loadDts.getOrElse(new Timestamp(System.currentTimeMillis())), recordSource, batchId)
        val hv = HashView.build(batch, transitions, algo)
        // bucket-pruned above the probe-prune gate: the anti-join only
        // consults hub keys in the BATCH's buckets (Lake.readOrProbe doc)
        val existing = lake.readOrProbe("dv", hubTable,
          StructType(StructField(hkName, StringType) :: Nil),
          hv, org.apache.spark.sql.functions.col(s"${groupName}_hk"))
        lake.appendIncrementBucketedUncounted(
          DvOps.newHubRows(hv, existing, groupName, bkFields, hkName, ctx), "dv", hubTable, hkName)
        ()
      }
      .start()
  }

  /** Streaming link sink: micro-batch incremental link load — hash view →
    * anti-join-against-existing-link → bucketed append (reference link/nhl
    * semantics, link_manager.py:110-192, extended to streams). `legFields`
    * maps hash-view columns (`<hubgroup>_hk` legs or degenerate-key fields)
    * to link columns; idempotency is the hk anti-join, same as [[hubSink]],
    * so at-least-once delivery and overlapping batches never duplicate a
    * relationship. Serves both `link` and `nhl` tables — the reference
    * loads them with the same INSERT pattern. */
  def linkSink(
      lake: Lake,
      staged: DataFrame,
      transitions: Seq[Transition],
      linkTable: String,
      groupName: String,
      legFields: Seq[(String, String)],
      hkName: String,
      recordSource: String,
      checkpoint: String,
      algo: HashGen.Algo = HashGen.Sha1,
      loadDts: Option[Timestamp] = None,
      statePartitions: Option[Int] = None
  ): StreamingQuery =
    staged.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sizeBatch(batch, statePartitions)
        val ctx = LoadContext(loadDts.getOrElse(new Timestamp(System.currentTimeMillis())), recordSource, batchId)
        val hv = HashView.build(batch, transitions, algo)
        // bucket-pruned above the probe-prune gate (Lake.readOrProbe doc)
        val existing = lake.readOrProbe("dv", linkTable,
          StructType(StructField(hkName, StringType) :: Nil),
          hv, org.apache.spark.sql.functions.col(s"${groupName}_hk"))
        lake.appendIncrementBucketedUncounted(
          DvOps.newLinkRows(hv, existing, groupName, legFields, hkName, ctx), "dv", linkTable, hkName)
        ()
      }
      .start()

  /** Streaming satellite (SCD2) sink: each micro-batch runs hash view →
    * latest-row hashdiff compare → bucketed append, so re-delivered or
    * unchanged rows never create duplicate versions (the anti-join is the
    * idempotency mechanism, same as [[hubSink]]). */
  def satSink(
      lake: Lake,
      staged: DataFrame,
      transitions: Seq[Transition],
      satTable: String,
      hkSource: String,
      hashdiffField: String,
      fields: Seq[(String, String)],
      satHk: String,
      recordSource: String,
      checkpoint: String,
      algo: HashGen.Algo = HashGen.Sha1,
      loadDts: Option[Timestamp] = None,
      statePartitions: Option[Int] = None
  ): StreamingQuery = {
    // Payload types from the staged stream (what the writes carry) — the
    // readOr below imposes this schema on the scan (see Lake.readOr).
    val satSchema = graft.dv.VaultSchemas.satFromFields(
      satHk, fields.map { case (s, t) => t -> staged.schema(s).dataType })
    staged.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sizeBatch(batch, statePartitions)
        val ctx = LoadContext(loadDts.getOrElse(new Timestamp(System.currentTimeMillis())), recordSource, batchId)
        val hv = HashView.build(batch, transitions, algo)
        // DELTA probe only (latest-per-key where the key is staged), so
        // the bucket-pruned read is semantics-identical (Lake.readOrProbe
        // doc); delete detection must never use this.
        val existing = lake.readOrProbe("dv", satTable, satSchema,
          hv, org.apache.spark.sql.functions.col(hkSource))
        lake.appendIncrementBucketedUncounted(
          DvOps.satNewRows(hv, existing, hkSource, hashdiffField, fields, satHk, ctx), "dv", satTable, satHk)
        ()
      }
      .start()
  }

  /** One closed (or timed-out) gap session. */
  final case class SessionOut(
      user_id: Long, n_events: Long, session_start: Timestamp, session_end: Timestamp)

  /** Open-session state: event-time bounds in microseconds + count. */
  final case class SessionAgg(startUs: Long, endUs: Long, n: Long)

  private def micros(ts: Timestamp): Long =
    Math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L

  private def fromMicros(us: Long): Timestamp = {
    val t = new Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  /** Gap-based streaming sessionization — custom per-key state via
    * `flatMapGroupsWithState` (the stream twin of the batch
    * `events_sessions` query). A session closes when a newer event starts
    * the next one, or when the event-time watermark passes its end + gap
    * (EventTimeTimeout), so state is bounded: one open session per user.
    * Input needs columns (user_id, ts, event_id); `ts` must carry the
    * watermark. Late events beyond the watermark are dropped upstream, which
    * is what makes emitting a closed session final. */
  def sessionize(events: DataFrame, gapMinutes: Int, delayThreshold: String): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    events
      .selectExpr("user_id", "ts", "event_id")
      .withWatermark("ts", delayThreshold)
      .as[(Long, Timestamp, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionAgg, SessionOut](OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[(Long, Timestamp, Long)], state: GroupState[SessionAgg]) =>
          val batch = rows.toSeq.sortBy(r => (micros(r._2), r._3))
          if (batch.isEmpty) {
            // Timeout: the watermark passed end+gap — the session can never
            // be extended again; emit and drop the state.
            val out = state.getOption.map(s => SessionOut(user, s.n, fromMicros(s.startUs), fromMicros(s.endUs)))
            state.remove()
            out.iterator
          } else {
            // Merge the open-session state as one more interval in event-time
            // order with this batch's events — out-of-order arrivals (late
            // events before, inside, or after the open session) then produce
            // exactly the sessions the batch lag-window query would: sessions
            // merge iff the inter-interval gap is ≤ gapUs.
            val intervals =
              (state.getOption.map(c => SessionAgg(c.startUs, c.endUs, c.n)).toList ++
                batch.map { case (_, ts, _) => val t = micros(ts); SessionAgg(t, t, 1) })
                .sortBy(s => (s.startUs, s.endUs))
            var closed = List.empty[SessionOut]
            var cur = intervals.head
            intervals.tail.foreach { iv =>
              if (iv.startUs - cur.endUs <= gapUs)
                cur = SessionAgg(cur.startUs, math.max(cur.endUs, iv.endUs), cur.n + iv.n)
              else {
                closed ::= SessionOut(user, cur.n, fromMicros(cur.startUs), fromMicros(cur.endUs))
                cur = iv
              }
            }
            state.update(cur)
            state.setTimeoutTimestamp(Math.floorDiv(cur.endUs, 1000L) + gapMinutes * 60L * 1000L)
            closed.reverseIterator
          }
      }
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
