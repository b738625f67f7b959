package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{AnnIndex, Multimodal}
import graft.streaming.EventsStream

/** Capability-extension battery: ANN index, streaming window twins,
  * multimodal decode plumbing (SURVEY.md §2.9, §7 steps 7-8).
  */
object ExtQueries {

  val defs: Seq[QueryDef] = Seq(

    // ---- S7: ANN index build + pruned query (IVF k-means) --------------
    // Approximate by construction → rows-only for the driver; recall vs
    // the exact oracle is asserted in AnnIndexSpec.
    QueryDef("q49_ann_ivf", (s, dir) => {
      val q = graft.functions.HashEmbedder.embed("distributed vector search engine")
      val (model, indexed) = AnnIndex.fitCached(Tables.embeddings(s, dir),
        dir, "embedding", "vec_id", k = 16, iters = 3)
      AnnIndex.query(indexed, model, "embedding", "vec_id", q, k = 10, nprobe = 4)
        .select(col("vec_id"), col("label"), round(col("dist"), 6).as("dist"))
    }, None),

    // ---- streaming twin: tumbling 1 h window agg -----------------------
    // (same transform runs on readStream in StreamingSpec; batch twin is
    // oracle-checked here)
    QueryDef("q50_tumbling_window", (s, dir) => {
      EventsStream.tumbling(Tables.events(s, dir))
        .orderBy("window_start", "event_type")
    }, Some("""
      SELECT date_trunc('hour', ts) AS window_start, event_type,
             count(*) AS n,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM events GROUP BY 1, 2 ORDER BY 1, 2""")),

    // ---- streaming twin: sliding 2 h / 1 h windows ---------------------
    QueryDef("q51_sliding_window", (s, dir) => {
      EventsStream.sliding(Tables.events(s, dir))
        .orderBy("window_start", "event_type")
    }, Some("""
      SELECT ws AS window_start, event_type, count(*) AS n,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM (
        SELECT unnest([date_trunc('hour', ts),
                       date_trunc('hour', ts) - INTERVAL 1 HOUR]) AS ws,
               event_type, value
        FROM events) t
      GROUP BY ws, event_type ORDER BY ws, event_type""")),

    // ---- multimodal: binary payload metadata (S4-adjacent) -------------
    QueryDef("q60_binary_meta", (s, dir) => {
      val bin = col("text").cast("binary")
      Tables.documents(s, dir)
        .select(
          col("doc_id"),
          octet_length(bin).cast("long").as("byte_len"),
          substring(md5(bin), 1, 8).as("magic"),
          concat(lit("img_"), substring(md5(bin), 1, 8)).as("caption"))
        .orderBy("doc_id")
    }, Some("""
      SELECT doc_id, CAST(strlen(text) AS BIGINT) AS byte_len,
             substr(md5(text), 1, 8) AS magic,
             'img_' || substr(md5(text), 1, 8) AS caption
      FROM documents ORDER BY doc_id""")),

    // ---- multimodal: per-partition decode stage (typed mapPartitions) --
    // The decode itself is a deterministic stub (no media libs here), so
    // the bytes→metadata map IS expressible in SQL for the oracle — which
    // lets the driver verify the mapPartitions plumbing end-to-end.
    QueryDef("q61_multimodal_decode", (s, dir) => {
      val blobs = Multimodal.blobsFromDocuments(s, Tables.documents(s, dir))
      Multimodal.decodeStub(blobs).toDF().orderBy("doc_id")
    }, Some("""
      SELECT doc_id,
             CAST(64 + ascii(substr(text, 1, 1)) % 64 AS BIGINT) AS width,
             CAST(64 + ascii(substr(text, 2, 1)) % 64 AS BIGINT) AS height,
             CAST(1 + strlen(text) % 16 AS BIGINT) AS n_frames
      FROM documents ORDER BY doc_id"""))
  )
}
