package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.HashEmbedder
import graft.operators.{GraphAnn, SelfQueryFilter => F}

/** Round-9 battery: SELECTIVITY-DISPATCHED filtered ANN (the r7/r8
  * verdict's last structural item — "an engine chooses").
  *
  * The reference's dominant query is filtered k-NN
  * (`app/backend/retriever/myscale_without_metadata.py:20-36`,
  * `docs/self-query.md:104`), and it never asks the CALLER to know
  * whether the predicate is scarce: the engine plans. These queries gate
  * [[graft.operators.GraphAnn!.topKBatchAuto]] end-to-end against the
  * q121/q129 oracle recipe, with the dispatch decision ASSERTED inside
  * the query (a wrong path choice fails the query, so the CORRECTNESS
  * artifact records it):
  *
  *   - q149: ~0.5% survivors → the dispatcher must pick the exact brute
  *     force over the graph's own pinned blocks (the filtered beam
  *     degrades toward full traversal exactly here — [[GraphAnn]] beam
  *     doc), and the result is oracle-exact BY CONSTRUCTION (brute is
  *     exhaustive over survivors).
  *   - q150: ~50% survivors → the dispatcher must keep the beam; full ef
  *     makes the beam exhaustive (q114's exactness contract), so the
  *     same oracle gates the path choice AND the results.
  *
  * The meta column derives arithmetically from `vec_id` (Round8Queries'
  * recipe: deterministic, SF-independent, expressed identically in both
  * engines): lbl = vec_id % 200 → Eq hits 0.5%, Lte(99) hits 50%.
  */
object Round9Queries {

  private val qText = "filtered vector search dispatch"
  private val qVec = HashEmbedder.embed(qText)
  private val qLit = HashEmbedder.sqlArrayLiteral(qVec)

  private def corpus(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding"),
        (col("vec_id") % 200).cast("long").as("lbl"))

  private def graph(s: org.apache.spark.sql.SparkSession, dir: String) =
    GraphAnn.buildCached(corpus(s, dir), dir + "#dispatch", "vec_id",
      "embedding", metaCols = Seq("lbl"))

  private def oracle(where: String): String = s"""
      SELECT vec_id,
        round(1.0 - list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                           CAST($qLit AS DOUBLE[])), 6) AS dist
      FROM embeddings
      WHERE $where
      ORDER BY 1.0 - list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                            CAST($qLit AS DOUBLE[])), vec_id
      LIMIT 10"""

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q149_ann_dispatch_brute", (s, dir) => {
      import s.implicits._
      val g = graph(s, dir)
      val filter: Option[F.Node] = Some(F.Eq("lbl", F.I(7L)))
      val (res, _, usedBrute) =
        g.topKAuto(qVec, 10, ef = g.rows.toInt, filter = filter)
      require(usedBrute,
        "dispatcher must brute-force a ~0.5%-selectivity predicate")
      res.toSeq.toDF("vec_id", "dist")
        .orderBy(col("dist"), col("vec_id"))
        .select(col("vec_id"), round(col("dist"), 6).as("dist"))
    }, Some(oracle("vec_id % 200 = 7"))),

    QueryDef("q150_ann_dispatch_beam", (s, dir) => {
      import s.implicits._
      val g = graph(s, dir)
      val filter: Option[F.Node] = Some(F.Lte("lbl", F.I(99L)))
      val (res, _, usedBrute) =
        g.topKAuto(qVec, 10, ef = g.rows.toInt, filter = filter)
      require(!usedBrute,
        "dispatcher must beam-search a ~50%-selectivity predicate")
      res.toSeq.toDF("vec_id", "dist")
        .orderBy(col("dist"), col("vec_id"))
        .select(col("vec_id"), round(col("dist"), 6).as("dist"))
    }, Some(oracle("vec_id % 200 <= 99")))
  )
}
