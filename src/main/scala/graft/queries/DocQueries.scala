package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** ChatData app-layer dataflows re-expressed as engine operators
  * (SURVEY.md §2.5 W1-W3, §2.4 A1-A4, §2.8, §3 EP3).
  */
object DocQueries {

  /** A2/A3/A4 via the ClickHouse dialect through spark.sql — the literal
    * list-files aggregation shape of the reference
    * (`app/backend/chat_bot/private_knowledge_base.py:73-78`:
    * `arrayMax(arrayMap(x->length(x), groupArray(text)))`).
    */
  private val groupArraySparkSql = """
      SELECT lang, count(*) AS n_docs,
             CAST(arrayMax(arrayMap(x -> length(x), groupArray(text))) AS BIGINT) AS max_len,
             md5(array_join(array_sort(groupArray(text)), '|')) AS fp
      FROM documents GROUP BY lang ORDER BY lang"""

  val defs: Seq[QueryDef] = Seq(

    // ---- W1: ReplacingMergeTree last-row-per-key compaction ------------
    // (ENGINE=ReplacingMergeTree ORDER BY id upsert semantics,
    //  myscale_tables.py:37,65 — latest event per user here)
    QueryDef("q30_replacing_merge", (s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(desc("ts"), desc("event_id"))
      Tables.events(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("user_id", "event_id", "ts", "event_type")
        .orderBy("user_id")
    }, Some("""
      SELECT user_id, event_id, ts, event_type FROM (
        SELECT user_id, event_id, ts, event_type,
          row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events) t
      WHERE rn = 1 ORDER BY user_id""")),

    // ---- W2+W3: ref-id enumeration + token-budget cutoff ---------------
    // (stuff_documents.py:29-31 ref_id assignment; build_chains.py:37
    //  max_tokens_limit=12000 running-sum truncation)
    QueryDef("q31_refid_token_cutoff", (s, dir) => {
      // Global (unpartitioned) window is intentional: in the reference
      // this runs over ONE retrieval's k<=10 docs (stuff_documents.py),
      // never a full table — at scale the input is always a small
      // retrieved set, so the single-partition WindowExec is not a
      // bottleneck. The test drives it over the whole table only to get
      // an oracle-checkable fixture.
      val w = Window.orderBy(desc("n_chars"), col("doc_id"))
      Tables.documents(s, dir)
        .withColumn("n_tokens",
          size(split(trim(col("text")), "\\s+")).cast("long"))
        .withColumn("ref_id", row_number().over(w) - 1)
        .withColumn("cum_tokens",
          sum(col("n_tokens")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .filter(col("cum_tokens") <= 2000)
        .select("ref_id", "doc_id", "n_tokens", "cum_tokens")
        .orderBy("ref_id")
    }, Some("""
      SELECT ref_id, doc_id, n_tokens, cum_tokens FROM (
        SELECT doc_id,
          row_number() OVER w - 1 AS ref_id,
          CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens,
          CAST(sum(len(regexp_split_to_array(trim(text), '\s+'))) OVER
            (ORDER BY n_chars DESC, doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
        FROM documents
        WINDOW w AS (ORDER BY n_chars DESC, doc_id)) t
      WHERE cum_tokens <= 2000 ORDER BY ref_id""")),

    // ---- A2/A3/A4: groupArray + arrayMap + arrayMax dialect ------------
    QueryDef("q32_grouparray_stats", (s, dir) => {
      Tables.documents(s, dir).createOrReplaceTempView("documents")
      s.sql(groupArraySparkSql)
    }, Some("""
      SELECT lang, count(*) AS n_docs,
             CAST(max(length(text)) AS BIGINT) AS max_len,
             md5(string_agg(text, '|' ORDER BY text)) AS fp
      FROM documents GROUP BY lang ORDER BY lang""")),

    // ---- Object('JSON') dynamic column: JSONExtract dialect ------------
    // (docs/vector-sql.md:200-216 metadata JSON flatten semantics)
    QueryDef("q33_json_props", (s, dir) => {
      Tables.events(s, dir).createOrReplaceTempView("events")
      s.sql("""
        SELECT event_type,
               CAST(sum(JSONExtractInt(props, 'k')) AS BIGINT) AS sum_k,
               count(*) AS n
        FROM events GROUP BY event_type ORDER BY event_type""")
    }, Some("""
      SELECT event_type,
             CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
             count(*) AS n
      FROM events GROUP BY event_type ORDER BY event_type""")),

    // ---- sessionization: gap > 1 h starts a new session ----------------
    // (chat-memory per-session partitioning analog, tools.py:74-78;
    //  batch twin of the streaming state op in graft.streaming)
    QueryDef("q34_sessionize", (s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, dir)
        .withColumn("prev_ts", lag(col("ts"), 1).over(w))
        .withColumn("is_new",
          when(col("prev_ts").isNull ||
            unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 3600L * 1000000L, 1)
            .otherwise(0))
        .withColumn("session_id", sum(col("is_new")).over(cum))
        .groupBy("user_id")
        .agg(
          max(col("session_id")).cast("long").as("n_sessions"),
          count(lit(1)).as("n_events"))
        .orderBy("user_id")
    }, Some("""
      SELECT user_id, CAST(max(session_id) AS BIGINT) AS n_sessions,
             count(*) AS n_events
      FROM (
        SELECT user_id, CAST(sum(is_new) OVER
          (PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        FROM (
          SELECT user_id, ts, event_id,
            CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                   OR epoch_us(ts) - epoch_us(lag(ts) OVER
                        (PARTITION BY user_id ORDER BY ts, event_id)) > 3600000000
                 THEN 1 ELSE 0 END AS is_new
          FROM events) a) b
      GROUP BY user_id ORDER BY user_id"""))
  )
}
