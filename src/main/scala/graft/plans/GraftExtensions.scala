package graft.plans

import org.apache.spark.sql.SparkSessionExtensions

import graft.functions.Registry

/** `spark.sql.extensions=graft.plans.GraftExtensions` installs the whole
  * engine surface on session construction: the Vector-SQL function dialect
  * (SURVEY.md §2.8) and graft's native expressions. Rules/strategies (ANN
  * top-k, must-have-column rewrite) are injected here too as they land.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    Registry.injectable.foreach(ext.injectFunction)
  }
}
