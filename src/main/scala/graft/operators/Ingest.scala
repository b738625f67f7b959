package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.HashEmbedder

/** The upload→parse→chunk→filter→embed→id ingest pipeline
  * (SURVEY.md §2.1 S4/S5, §2.2 P9, §2.10; reference
  * `app/backend/chat_bot/tools.py:13-60` + `private_knowledge_base.py:104-121`):
  *
  *   1. parse: file → elements. The reference POSTs to the Unstructured
  *      API; here the parser is a pluggable stage — the default chunker
  *      splits a text into fixed 15-token windows (a Generator/flatMap,
  *      the `arrayJoin`/UDTF class of operator).
  *   2. filter: keep elements with more than 10 words — exactly the
  *      reference's `len(e['text'].split(' ')) > 10` NarrativeText rule
  *      (`tools.py:42`).
  *   3. entity_id: sha256 over (source, chunk) — `tools.py:35-37`.
  *   4. embed: deterministic batch embedder over `mapPartitions`
  *      (model-per-partition pattern, `tools.py:53-60`), with the 768-d
  *      (here 64-d) dim check of the DDL CHECK constraint.
  */
object Ingest {

  val ChunkTokens = 15

  /** doc rows (id, source, text) → chunk rows; pure Generator pipeline
    * (posexplode), no UDFs, fully parallel.
    */
  def chunk(docs: DataFrame, idCol: String, sourceCol: String, textCol: String): DataFrame = {
    val t = split(trim(col(textCol)), "\\s+")
    docs
      .withColumn("__t", t)
      .withColumn("__chunks", expr(
        s"transform(sequence(0, (size(__t) + ${ChunkTokens - 1}) div $ChunkTokens - 1), " +
        s"i -> array_join(slice(__t, i * $ChunkTokens + 1, $ChunkTokens), ' '))"))
      .select(col(idCol), col(sourceCol),
        posexplode(col("__chunks")).as(Seq("chunk_idx", "chunk_text")))
  }

  /** P9: the reference's element filter (`> 10` words, strict). */
  def narrativeFilter(chunks: DataFrame, textCol: String = "chunk_text"): DataFrame =
    chunks.filter(size(split(col(textCol), " ")) > 10)

  /** sha256 entity id over (source, text) — `tools.py:35-37`. */
  def withEntityId(chunks: DataFrame, sourceCol: String, textCol: String): Column =
    sha2(concat(col(sourceCol), lit("#"), col(textCol)), 256)

  /** Batch embed: the [[org.apache.spark.sql.graft.NeuralArray]] expression
    * stays inside whole-stage codegen (no UDF serialization boundary); a
    * real model would instead follow the per-partition-session pattern of
    * [[Multimodal.decodeStub]]. Dim check included (DDL CHECK analog).
    */
  def embed(chunks: DataFrame, textCol: String, dim: Int = HashEmbedder.DefaultDim): DataFrame = {
    import org.apache.spark.sql.graft.Bridge.{toColumn, toExpr}
    chunks.withColumn("vector",
      toColumn(org.apache.spark.sql.graft.NeuralArray(toExpr(col(textCol)), dim)))
  }
}
