package org.apache.spark.sql.graft

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData

/** ANN short-circuit for vector top-k (SURVEY.md §4 "ANN-index
  * short-circuit = custom rule rewriting Sort(dist)+Limit(k) over an
  * indexed table into centroid-pruned scan").
  *
  * The reference delegates this to MyScale's MSTG index: the same
  * `ORDER BY distance(...) LIMIT k` SQL runs approximate because the table
  * has a vector index (`myscale_tables.py:35,63`). graft mirrors that
  * contract: if the scanned relation carries a `cluster_id` column
  * produced by [[graft.operators.AnnIndex]], a model is registered, and
  * the user opted in (`spark.graft.ann.enabled=true`), then
  *
  *   GlobalLimit(k, LocalLimit(k, Sort(dist, Project(.. dist=cosine ..))))
  *
  * gains a `cluster_id IN (nprobe nearest centroids)` filter under the
  * Project — so parquet partition pruning (table persisted
  * PARTITION BY cluster_id) makes the query touch nprobe/k of the data.
  * Results become approximate exactly like the reference's MSTG path;
  * opt-in keeps the default exact.
  */
case class AnnTopKRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    spark.conf.getOption("spark.graft.ann.enabled").contains("true")
  private def nprobe: Int =
    spark.conf.getOption("spark.graft.ann.nprobe").map(_.toInt).getOrElse(4)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    // Limit(Sort(dist, Project)) with an optional column-pruning Project
    // wedged between limit and sort (shape depends on what the consumer
    // selects afterwards).
    plan transformDown {
      case gl @ GlobalLimit(_, ll @ LocalLimit(_, inner)) =>
        val rewritten = inner match {
          case s @ Sort(SortOrder(a: Attribute, Ascending, _, _) +: _, true,
              p @ Project(pl, child), _) =>
            rewrite(a, pl, child).map(nc => s.copy(child = p.copy(child = nc)))
          case pp @ Project(_, s @ Sort(SortOrder(a: Attribute, Ascending, _, _) +: _, true,
              p @ Project(pl, child), _)) =>
            rewrite(a, pl, child).map(nc =>
              pp.copy(child = s.copy(child = p.copy(child = nc))))
          case _ => None
        }
        rewritten.map(r => gl.copy(child = ll.copy(child = r))).getOrElse(gl)
    }
  }

  /** If sortAttr aliases cosine_distance(emb, literal) in projList and the
    * child exposes a MATERIALIZED `cluster_id` column (AnnIndex.fit caches
    * the assigned table — the index is built once, never recomputed inside
    * a query), add the prune. Guarded against fixed-point re-application.
    */
  private def rewrite(sortAttr: Attribute, projList: Seq[NamedExpression],
      child: LogicalPlan): Option[LogicalPlan] = {
    val distAlias = projList.collectFirst {
      case a @ Alias(CosineDistance(_: Attribute, Literal(v: ArrayData, _)), _)
          if a.exprId == sortAttr.exprId => v
    }
    val clusterAttr = child.output.find(_.name == "cluster_id")
    val alreadyPruned = child.exists {
      case Filter(cond, _) => cond.exists {
        case a: Attribute => a.name == "cluster_id"
        case _ => false
      }
      case _ => false
    }
    (distAlias, clusterAttr, AnnTopKRule.activeModel) match {
      case (Some(qv), Some(cid), Some(model)) if !alreadyPruned =>
        val q = qv.toFloatArray()
        val probed = model.nearest(q, nprobe)
        Some(Filter(In(cid, probed.map(i => Literal(i))), child))
      case _ => None
    }
  }
}

object AnnTopKRule {
  /** Session-lifetime model registry (driver-side; centroids are tiny). */
  private val models = new TrieMap[String, graft.operators.AnnIndex.Model]
  @volatile private var active: Option[String] = None

  def register(name: String, model: graft.operators.AnnIndex.Model): Unit = {
    models.put(name, model)
    active = Some(name)
  }
  def activeModel: Option[graft.operators.AnnIndex.Model] =
    active.flatMap(models.get)
  def clear(): Unit = { models.clear(); active = None }
}
