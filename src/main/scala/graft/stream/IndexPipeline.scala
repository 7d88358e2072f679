package graft.stream

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.Tables

/** P1–P5 — the reference's async indexing pipeline (SURVEY §2 B), rebuilt
  * as Structured Streaming: a mutation log is consumed in micro-batches and
  * merged into a last-write-wins state table keyed by entity id.
  *
  * Reference semantics upgraded, not copied: RabbitMQ's non-durable queue
  * gives at-most-once delivery (`BdiDemoApplication.java:23`, listener
  * swallows errors `IndexingListener.java:53-57`); checkpointing + an
  * idempotent merge give exactly-once here. SAVE upserts the latest record
  * per key (`IndexingListener.java:115-125` — ES PUT by id), DELETE
  * tombstones it (`:127-131`).
  *
  * Scale shape: each micro-batch merge is `(state ∪ batch) → max-seq per
  * key` — one shuffle on the key; state lives in a keyed columnar table
  * (at cluster scale: bucketed by key hash so the merge join never
  * re-shuffles the big side; never collected to the driver).
  */
object IndexPipeline {

  type Q = (SparkSession, String) => DataFrame

  /** The `events` table as a mutation log: `event_id` = sequence number,
    * `user_id` = entity key, 'error' events = DELETE, all else SAVE. */
  def mutationLog(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).select(
      col("event_id").as("seq"),
      col("user_id").as("key"),
      when(col("event_type") === "error", "DELETE").otherwise("SAVE").as("op"),
      col("event_type"), col("value"))

  /** Merge one micro-batch into `state`: keep the max-seq record per key.
    * Pure DataFrame→DataFrame so the batch path reuses it verbatim. */
  def merge(state: DataFrame, batch: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("key")).orderBy(col("seq").desc)
    val counted = batch.groupBy(col("key")).agg(
      max(col("seq")).as("b_seq"), count(lit(1)).as("b_n"))
    val latest = batch.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
      .join(counted, "key")
      .select(col("key"), col("seq"), col("op"), col("event_type"),
        col("value"), col("b_n").as("n_events"))
    state.unionByName(latest)
      .withColumn("rn", row_number().over(w))
      .withColumn("n_total", sum(col("n_events")).over(Window.partitionBy(col("key"))))
      .filter(col("rn") === 1)
      .select(col("key"), col("seq"), col("op"), col("event_type"),
        col("value"), col("n_total").as("n_events"))
  }

  /** Run the whole log through the streaming pipeline in `nFiles`
    * micro-batches (Trigger.AvailableNow + maxFilesPerTrigger=1) and
    * return the final state: live (non-tombstoned) entities. */
  def run(s: SparkSession, d: String, nFiles: Int = 4): DataFrame = {
    val base = Files.createTempDirectory("graft-stream-")
    val srcDir = base.resolve("log").toString
    val ckDir = base.resolve("ck").toString
    val stateDir = base.resolve("state")

    // Stage the log as nFiles files split by seq range — deterministic
    // micro-batch boundaries (file order = lexicographic part-file name).
    val log = mutationLog(s, d)
    val maxSeq = log.agg(max(col("seq"))).head().getLong(0) + 1
    (0 until nFiles).foreach { i =>
      log.filter(floor(col("seq") * nFiles / maxSeq) === i)
        .coalesce(1).write.parquet(s"$srcDir/b$i")
    }

    var state: DataFrame = s.createDataFrame(
      s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType.fromDDL(
        "key BIGINT, seq BIGINT, op STRING, event_type STRING, value DOUBLE, n_events BIGINT"))

    val stream = s.readStream
      .schema(log.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$srcDir/b*")
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // Persist state per batch (exactly-once: version dir per batch id,
        // idempotent on replay).
        val out = stateDir.resolve(s"v$batchId").toString
        merge(state, batch).write.mode("overwrite").parquet(out)
        state = s.read.parquet(out)
        ()
      }
      .start()
    stream.awaitTermination()

    val result = state.filter(col("op") =!= "DELETE")
      .select(col("key").as("user_id"), col("seq").as("last_event_id"),
        col("event_type").as("last_type"), col("value").as("last_value"),
        col("n_events"))
      .orderBy(col("user_id"))
    val pinned = graft.Eager.pin(result) // materialize before the temp dir is deleted
    deleteRecursively(base)
    pinned
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[Path]()).forEach(f => Files.delete(f))

  // ---------------------------------------------------------------- st1
  private def st1(s: SparkSession, d: String): DataFrame = run(s, d)

  private val st1Sql =
    """WITH latest AS (
      |  SELECT user_id, event_id, event_type, value,
      |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn,
      |    COUNT(*) OVER (PARTITION BY user_id) AS n_events
      |  FROM events)
      |SELECT user_id, event_id AS last_event_id, event_type AS last_type,
      |  value AS last_value, CAST(n_events AS BIGINT) AS n_events
      |FROM latest WHERE rn = 1 AND event_type <> 'error'
      |ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------- st2
  /** Event-time windowed streaming aggregation: tumbling 6-hour windows per
    * event type with a 1-hour watermark, micro-batched over the staged log.
    *
    * Complete output mode — with Trigger.AvailableNow the watermark only
    * closes windows the final batch has moved past; complete mode emits the
    * full windowed state so the batch oracle (GROUP BY epoch-aligned
    * bucket) matches exactly. The decimal-cast sum keeps the value total
    * order-independent across micro-batch boundaries. */
  private def st2(s: SparkSession, d: String): DataFrame = {
    val base = Files.createTempDirectory("graft-stream2-")
    val srcDir = base.resolve("log").toString
    val ckDir = base.resolve("ck").toString
    val nFiles = 3
    val ev = Tables.events(s, d)
      .select(col("event_id"), col("ts_us"), col("event_type"), col("value"))
    val maxId = ev.agg(max(col("event_id"))).head().getLong(0) + 1
    (0 until nFiles).foreach { i =>
      ev.filter(floor(col("event_id") * nFiles / maxId) === i)
        .coalesce(1).write.parquet(s"$srcDir/b$i")
    }
    val qname = s"st2_windowed_${System.nanoTime()}"
    val stream = s.readStream
      .schema(ev.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$srcDir/b*")
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "6 hours"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(12, 2))).as("total_dec"))
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(qname)
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckDir)
      .start()
    stream.awaitTermination()
    val out = s.table(qname)
      .select(
        col("window.start").cast("long").as("win_start"),
        col("event_type"), col("n"),
        col("total_dec").cast(org.apache.spark.sql.types.DecimalType(28, 6))
          .cast("double").as("total"))
      .orderBy(col("win_start"), col("event_type"))
      
    val pinned = graft.Eager.pin(out)
    deleteRecursively(base)
    pinned
  }

  private val st2Sql =
    """SELECT epoch_us(ts) // 21600000000 * 21600 AS win_start, event_type,
      |  COUNT(*) AS n,
      |  CAST(CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DECIMAL(28,6)) AS DOUBLE) AS total
      |FROM events GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin

  // ---------------------------------------------------------------- st3
  /** Arbitrary stateful streaming via `mapGroupsWithState`: the
    * last-write-wins entity state held IN the streaming operator (per-key
    * state store) instead of a foreachBatch-merged table — the
    * `KeyValueGroupedDataset` custom-state surface. Emits the state per key
    * per batch; the final row per key is the answer (same oracle semantics
    * as st1).
    *
    * Scale shape: state is one small case class per key in the state store
    * (RocksDB at cluster scale), partitioned by key hash — no global
    * state, no driver involvement. */
  private def st3(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.streaming.GroupState

    val base = Files.createTempDirectory("graft-stream3-")
    val srcDir = base.resolve("log").toString
    val ckDir = base.resolve("ck").toString
    val log = mutationLog(s, d)
    val maxSeq = log.agg(max(col("seq"))).head().getLong(0) + 1
    val nFiles = 3
    (0 until nFiles).foreach { i =>
      log.filter(floor(col("seq") * nFiles / maxSeq) === i)
        .coalesce(1).write.parquet(s"$srcDir/b$i")
    }

    def update(key: Long, events: Iterator[EntityEvent],
               state: GroupState[EntityState]): EntityState = {
      val prior = state.getOption.getOrElse(EntityState(key, -1L, "", "", 0.0, 0L))
      // fold the batch: max-seq record wins, counts accumulate
      val next = events.foldLeft(prior) { (acc, e) =>
        val n = acc.n_events + 1
        if (e.seq > acc.seq)
          EntityState(key, e.seq, e.op, e.event_type, e.value, n)
        else acc.copy(n_events = n)
      }
      state.update(next)
      next
    }

    val qname = s"st3_state_${System.nanoTime()}"
    val stream = s.readStream
      .schema(log.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$srcDir/b*")
      .as[EntityEvent]
      .groupByKey(_.key)
      .mapGroupsWithState(update _)
      .writeStream
      .outputMode("update")
      .format("memory")
      .queryName(qname)
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckDir)
      .start()
    stream.awaitTermination()

    // update mode emits one row per touched key per batch — latest wins
    val w = Window.partitionBy(col("key")).orderBy(col("seq").desc, col("n_events").desc)
    val out = s.table(qname)
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .filter(col("op") =!= "DELETE")
      .select(col("key").as("user_id"), col("seq").as("last_event_id"),
        col("event_type").as("last_type"), col("value").as("last_value"),
        col("n_events"))
      .orderBy(col("user_id"))
      
    val pinned = graft.Eager.pin(out)
    deleteRecursively(base)
    pinned
  }

  private val st3Sql = st1Sql // identical last-write-wins semantics

  // ---------------------------------------------------------------- st4
  /** Streaming session windows: per-user sessions split at >30-min
    * event-time gaps, built with the native `session_window` stateful
    * operator — sessions MERGE across micro-batch boundaries (an event in
    * batch 3 can bridge two sessions opened in batch 1), which is the
    * part the batch gaps-and-islands form (q23) cannot exercise.
    * Complete output mode emits the final session state. */
  private def st4(s: SparkSession, d: String): DataFrame = {
    val base = Files.createTempDirectory("graft-stream4-")
    val srcDir = base.resolve("log").toString
    val ckDir = base.resolve("ck").toString
    val nFiles = 3
    val ev = Tables.events(s, d)
      .select(col("event_id"), col("ts_us"), col("user_id"))
    val maxId = ev.agg(max(col("event_id"))).head().getLong(0) + 1
    (0 until nFiles).foreach { i =>
      ev.filter(floor(col("event_id") * nFiles / maxId) === i)
        .coalesce(1).write.parquet(s"$srcDir/b$i")
    }
    val qname = s"st4_sessions_${System.nanoTime()}"
    val stream = s.readStream
      .schema(ev.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$srcDir/b*")
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", "1 hour")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(qname)
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckDir)
      .start()
    stream.awaitTermination()
    val out = s.table(qname)
      .select(col("user_id"),
        col("session_window.start").cast("long").as("sess_start"),
        col("session_window.end").cast("long").as("sess_end"),
        col("n_events"))
      .orderBy(col("user_id"), col("sess_start"))
      
    val pinned = graft.Eager.pin(out)
    deleteRecursively(base)
    pinned
  }

  private val st4Sql =
    """WITH ev AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
      |flagged AS (
      |  SELECT user_id, us, event_id,
      |    CASE WHEN us - LAG(us, 1) OVER (PARTITION BY user_id ORDER BY us, event_id)
      |              > 30 * 60 * 1000000 THEN 1 ELSE 0 END AS new_sess
      |  FROM ev),
      |sess AS (
      |  SELECT user_id, us,
      |    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY us, event_id) AS sess_id
      |  FROM flagged)
      |SELECT user_id,
      |  MIN(us) // 1000000 AS sess_start,
      |  (MAX(us) + 30 * 60 * 1000000) // 1000000 AS sess_end,
      |  COUNT(*) AS n_events
      |FROM sess GROUP BY user_id, sess_id
      |ORDER BY user_id, sess_start""".stripMargin

  val queries: Map[String, Q] = Map(
    "st1_stream_upsert" -> st1 _,
    "st2_stream_window" -> st2 _,
    "st3_stream_mgws" -> st3 _,
    "st4_stream_sessions" -> st4 _)
  val oracle: Map[String, String] = Map(
    "st1_stream_upsert" -> st1Sql,
    "st2_stream_window" -> st2Sql,
    "st3_stream_mgws" -> st3Sql,
    "st4_stream_sessions" -> st4Sql)
}

/** Mutation-log row (st3's typed view of `mutationLog`). */
case class EntityEvent(seq: Long, key: Long, op: String, event_type: String, value: Double)

/** Per-key streaming state: the latest record + cumulative event count. */
case class EntityState(key: Long, seq: Long, op: String, event_type: String,
                       value: Double, n_events: Long)
