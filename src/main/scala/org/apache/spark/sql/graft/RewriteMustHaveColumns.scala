package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule

/** P2: the SELECT-list rewrite (SURVEY.md §2.2 P2, §4).
  *
  * The reference's `VectorSQLRetrieveOutputParser.parse` does string
  * surgery on LLM-emitted SQL: it replaces everything between SELECT and
  * FROM with the table's `must_have_columns` so retrieval always returns
  * the id/title/metadata columns the app needs
  * (`app/backend/retrievers/vector_sql_output_parser.py:16-23`).
  *
  * Spark-native: an analyzer rule on the *resolved plan* — no string
  * surgery. For any `Project` directly over a view named in
  * `spark.graft.mustHave.<viewName>` (comma-separated column list), the
  * missing must-have columns are appended to the projection. Idempotent
  * (fixed-point safe): a second pass finds nothing missing.
  */
case class RewriteMustHaveColumns(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan resolveOperatorsUp {
    case p @ Project(projectList, child @ SubqueryAlias(ident, _))
        if p.resolved && child.resolved =>
      spark.conf.getOption(s"spark.graft.mustHave.${ident.name}") match {
        case None => p
        case Some(cols) =>
          val must = cols.split(",").map(_.trim).filter(_.nonEmpty)
          val present = projectList.map(_.name).toSet
          val missing = must.filterNot(present)
            .flatMap(m => child.output.find(_.name == m))
          if (missing.isEmpty) p else Project(projectList ++ missing, child)
      }
  }
}
