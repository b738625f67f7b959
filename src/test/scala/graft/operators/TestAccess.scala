package graft.operators

import org.apache.spark.rdd.RDD

/** Test-only bridge to `private[operators]` members, so specs (package
  * graft) can compare internal structures field-by-field without widening
  * production visibility.
  */
object TestAccess {
  def blocks(g: IvfGraph): RDD[(Int, GraphAnn.Graph)] = g.blocks
  def model(g: IvfGraph): AnnIndex.Model = g.model
}
