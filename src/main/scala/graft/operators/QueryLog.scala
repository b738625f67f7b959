package graft.operators

import java.util.concurrent.atomic.AtomicLong

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** ClickHouse `system.query_log` analog: every completed action on the
  * session is recorded (id, event time, wall duration, output-row metric,
  * a plan fingerprint, success/error) and queryable as a DataFrame /
  * `system_query_log` temp view — the observability surface an engine
  * operator reads first when a 100 TB query misbehaves.
  *
  * Spark-first: a [[QueryExecutionListener]] (the engine's own
  * instrumentation bus — no wrapping of user code), a BOUNDED in-memory
  * ring (default 10k entries, O(1) append, oldest evicted) on the
  * driver, surfaced through `createDataFrame` at read time. CH keeps its
  * query_log in a MergeTree table; here persistence is one
  * `log().write.parquet(...)` away and deliberately not automatic — the
  * ring must never become a write amplifier on the hot path.
  */
object QueryLog {

  final case class Entry(
      query_id: Long,
      event_time: java.sql.Timestamp,
      duration_ms: Double,
      output_rows: Long, // -1 when the sink reports no row metric
      plan_node: String, // root physical operator (fingerprint, not text dump)
      status: String, // 'QueryFinish' | 'ExceptionWhileProcessing' (CH names)
      error: String)

  private val seq = new AtomicLong(0)
  private val maxEntries = 10000
  private val ring = new java.util.ArrayDeque[Entry](1024)
  private val installed = mutable.Set.empty[SparkSession]

  private def record(qe: QueryExecution, durationNs: Long, err: Option[Throwable]): Unit = {
    val rows = try {
      qe.executedPlan.metrics.get("numOutputRows").map(_.value).getOrElse(-1L)
    } catch { case _: Throwable => -1L }
    val node = try qe.executedPlan.nodeName catch { case _: Throwable => "?" }
    val e = Entry(
      seq.incrementAndGet(),
      new java.sql.Timestamp(System.currentTimeMillis()),
      durationNs / 1e6,
      rows,
      node,
      if (err.isEmpty) "QueryFinish" else "ExceptionWhileProcessing",
      err.map(t => Option(t.getMessage).getOrElse(t.getClass.getName).take(200))
        .getOrElse(""))
    ring.synchronized {
      ring.addLast(e)
      while (ring.size() > maxEntries) ring.removeFirst()
    }
  }

  /** Attach the listener to a session. Idempotent per session. */
  def install(spark: SparkSession): Unit = synchronized {
    if (!installed.contains(spark)) {
      spark.listenerManager.register(new QueryExecutionListener {
        override def onSuccess(funcName: String, qe: QueryExecution,
            durationNs: Long): Unit = record(qe, durationNs, None)
        override def onFailure(funcName: String, qe: QueryExecution,
            exception: Exception): Unit = record(qe, 0L, Some(exception))
      })
      installed += spark
    }
  }

  /** The log as a DataFrame, newest first; also registered as the
    * `system_query_log` temp view (the `system.query_log` spelling with
    * `.` is not a valid Spark identifier).
    */
  def log(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val snapshot = ring.synchronized {
      import scala.jdk.CollectionConverters._
      ring.iterator().asScala.toVector
    }
    val df = snapshot.sortBy(-_.query_id).toDF()
    df.createOrReplaceTempView("system_query_log")
    df
  }

  def clear(): Unit = ring.synchronized(ring.clear())
}
