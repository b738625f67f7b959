package graft.operators

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** ClickHouse QUERY RESULT CACHE (`use_query_cache = 1`): serve a
  * repeated query's RESULT without re-executing its plan.
  *
  * CH's contract, mirrored here: opt-in per query (never ambient),
  * keyed on the query text, bounded total budget with per-entry size
  * cap (`query_cache_max_size_in_bytes` analog — an over-cap result is
  * returned but NOT cached), TTL-based staleness, LRU eviction. The
  * cache lives on the driver and stores collected Rows — which is
  * exactly what makes it only suitable for SMALL results (dashboards,
  * repeated aggregates); a 100 TB scan whose ANSWER is 50 rows is the
  * target shape, and the per-entry cap refuses anything else.
  *
  * Invalidation is the caller's concern (as in CH, where the cache is
  * TTL-stale by design): `clear()` after mutations, or rely on the TTL.
  */
final class QueryCache(
    spark: SparkSession,
    maxTotalBytes: Long = 64L * 1024 * 1024,
    maxEntryBytes: Long = 4L * 1024 * 1024,
    ttlMillis: Long = Long.MaxValue,
    nowMs: () => Long = () => System.currentTimeMillis()) {

  private case class Entry(schema: org.apache.spark.sql.types.StructType,
      rows: Array[Row], bytes: Long, at: Long)

  private val entries = new java.util.LinkedHashMap[String, Entry](16, 0.75f, true)
  private var totalBytes = 0L
  val hits = new AtomicLong(0)
  val misses = new AtomicLong(0)

  /** Execute (or serve) a SQL text. The result materializes on the
    * driver either way — the cache only changes WHO computes it.
    */
  def sql(text: String): DataFrame = cachedBy(text)(spark.sql(text))

  /** Cache arbitrary DataFrame results under an explicit key (for the
    * DataFrame API path, where no stable text exists).
    */
  def cachedBy(key: String)(build: => DataFrame): DataFrame = {
    val now = nowMs()
    val hit = entries.synchronized {
      Option(entries.get(key)).filter(e => now - e.at <= ttlMillis)
    }
    hit match {
      case Some(e) =>
        hits.incrementAndGet()
        spark.createDataFrame(
          java.util.Arrays.asList(e.rows: _*), e.schema)
      case None =>
        misses.incrementAndGet()
        val df = build
        val rows = df.collect()
        val bytes = estimate(rows)
        if (bytes <= maxEntryBytes) entries.synchronized {
          Option(entries.remove(key)).foreach(old => totalBytes -= old.bytes)
          entries.put(key, Entry(df.schema, rows, bytes, now))
          totalBytes += bytes
          val it = entries.entrySet().iterator()
          while (totalBytes > maxTotalBytes && it.hasNext) {
            val oldest = it.next() // access-order map: LRU first
            if (oldest.getKey != key) { totalBytes -= oldest.getValue.bytes; it.remove() }
          }
        }
        spark.createDataFrame(java.util.Arrays.asList(rows: _*), df.schema)
    }
  }

  /** Rough driver-memory estimate: strings dominate; primitives ~16B. */
  private def estimate(rows: Array[Row]): Long = {
    var b = 0L
    rows.foreach { r =>
      var i = 0
      while (i < r.length) {
        b += (r.get(i) match {
          case s: String => 40L + 2L * s.length
          case a: Seq[_] => 48L + 16L * a.length
          case _ => 16L
        })
        i += 1
      }
    }
    b + 32L * rows.length
  }

  def size: Int = entries.synchronized(entries.size())
  def usedBytes: Long = entries.synchronized(totalBytes)
  def clear(): Unit = entries.synchronized {
    entries.clear(); totalBytes = 0
  }
}
