package org.apache.spark.sql.graft

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions.{col, count, lit, max, min, sum}
import org.apache.spark.sql.types._

/** ClickHouse-style table PROJECTIONS: a pre-aggregated copy of a table
  * that the OPTIMIZER substitutes into matching aggregate queries, so the
  * user keeps writing `GROUP BY` over the base table and the engine reads
  * the (orders-of-magnitude smaller) rollup instead.
  *
  * This is the reference engine's `ALTER TABLE .. ADD PROJECTION (SELECT
  * keys, aggs GROUP BY keys)` + automatic projection selection (ClickHouse
  * "Projections" docs; MyScale inherits the feature wholesale). At 100 TB
  * this is THE mechanism that turns a full-fact-table aggregate into a
  * scan of a few thousand rollup rows.
  *
  * Spark-first shape — no custom physical operator is needed:
  *
  *   - the projection itself is ordinary partial-aggregate state persisted
  *     as parquet ([[ProjectionCatalog.define]]): per (key...) group it
  *     stores `__cnt` (COUNT(*)) and, per measure, `__sum_m` / `__min_m` /
  *     `__max_m` / `__cnt_m` — all RE-AGGREGABLE, the same partial-state
  *     algebra Spark's own two-phase hash aggregate uses;
  *   - [[ProjectionRewrite]] is a `Rule[LogicalPlan]` (installed through
  *     `experimental.extraOptimizations`, like [[AnnTopKRule]]) that
  *     matches `Aggregate` over a REGISTERED base-table scan — optionally
  *     through `Filter`s whose predicates touch only projection keys, the
  *     column-pruning `Project`, and view aliases — and rewrites it to the
  *     same `Aggregate` over the projection scan with merged partials:
  *     SUM→SUM(__sum), COUNT(*)→SUM(__cnt), COUNT(m)→SUM(__cnt_m),
  *     MIN/MAX→MIN/MAX(__min/__max), AVG(m)→SUM(__sum_m)/SUM(__cnt_m).
  *
  * Exactness contract: integral sums/counts/min/max are exact; decimal
  * sums are exact when the measure is registered with the SAME decimal
  * cast the query uses (graft's oracle-parity `QueryDef.dec` pattern);
  * double sums/avgs re-associate the summation (identical up to fp
  * association, as in ClickHouse). Output exprIds/names/types are
  * preserved, so parent operators above the Aggregate are untouched.
  *
  * Rollup subsumption: a query grouping by a SUBSET of the projection
  * keys re-aggregates the rollup (the group-by algebra is associative);
  * equality holds because every stored partial is mergeable.
  */
object ProjectionCatalog {

  /** A measure column; `cast` records the exact-arithmetic cast (if any)
    * that queries apply before SUM — `sum(dec(c))` matches only a measure
    * registered with the same decimal type.
    */
  final case class Measure(colName: String, cast: Option[DataType] = None)

  final case class ProjDef(
      name: String,
      basePath: String,
      projPath: String,
      keys: Seq[String],
      measures: Seq[Measure],
      baseFingerprint: String = "") {
    def measureFor(attr: String, cast: Option[DataType]): Option[Measure] =
      measures.find(m => m.colName == attr && m.cast == cast)
    def hasMeasure(attr: String): Boolean = measures.exists(_.colName == attr)
  }

  private val defs = new TrieMap[String, Vector[ProjDef]] // basePath -> projections
  // analyzed projection scans, memoized: analysis includes a driver-side
  // file listing, which must not repeat on every optimizer pass at scale.
  // Served via newInstance() so each use gets fresh exprIds.
  private val planCache = new TrieMap[String, LogicalPlan]

  private[graft] def freshProjPlan(spark: SparkSession, projPath: String): LogicalPlan =
    planCache.getOrElseUpdate(projPath,
      spark.read.parquet(projPath).queryExecution.analyzed) match {
      case lr: LogicalRelation => lr.newInstance()
      case other               => other
    }

  def normalize(p: String): String =
    p.stripPrefix("file:").replaceAll("/+$", "")

  /** Cheap base-dir fingerprint: direct children (names, sizes, mtimes)
    * of a LOCAL base path, hashed. Catches out-of-band writes (plain
    * df.write.parquet over the base) that bypass the Catalog mutation
    * hooks — the reference maintains projections on every insert, so a
    * stale rollup silently serving would be a divergence (r9 ADVICE).
    * One shallow listing, O(#direct entries) — never a recursive walk.
    * Non-local/unlistable paths return "" → the documented define-time
    * snapshot contract applies unchanged.
    */
  def fingerprint(basePath: String): String = {
    import java.nio.file._
    import scala.jdk.CollectionConverters._
    val p = Paths.get(normalize(basePath))
    try {
      if (!Files.isDirectory(p)) ""
      else {
        val h = new scala.util.hashing.MurmurHash3.ArrayHashing[String]
        val l = Files.list(p)
        val entries =
          try l.iterator().asScala.map { c =>
            val sz = if (Files.isRegularFile(c)) Files.size(c) else -1L
            s"${c.getFileName}:$sz:${Files.getLastModifiedTime(c).toMillis}"
          }.toArray.sorted
          finally l.close()
        h.hash(entries).toString
      }
    } catch { case _: Exception => "" }
  }

  /** Build + register a projection: one shuffle over the base table, then
    * a parquet write of the rollup. Deterministic (pure aggregate of the
    * base), so re-defining is idempotent in content.
    */
  /** One partial-state aggregation of `df` — the mergeable rollup row
    * set shared by projections and [[graft.operators.MatView]]: per
    * (key...) group, `__cnt` plus `__sum/__min/__max/__cnt` per measure.
    * Re-aggregating these partials with SUM/MIN/MAX/SUM is exact for any
    * split of the input rows (the same algebra Spark's two-phase hash
    * aggregate relies on).
    */
  def partialAgg(df: DataFrame, keys: Seq[String], measures: Seq[Measure]): DataFrame = {
    val aggs = measures.flatMap { m =>
      val summed = m.cast.map(t => col(m.colName).cast(t)).getOrElse(col(m.colName))
      Seq(
        sum(summed).as(s"__sum_${m.colName}"),
        min(col(m.colName)).as(s"__min_${m.colName}"),
        max(col(m.colName)).as(s"__max_${m.colName}"),
        count(col(m.colName)).as(s"__cnt_${m.colName}"))
    } :+ count(lit(1)).as("__cnt")
    df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  def define(spark: SparkSession, name: String, basePath: String,
      projPath: String, keys: Seq[String], measures: Seq[Measure]): ProjDef = {
    // The build MUST read the BASE: on a re-define, the build aggregate
    // itself matches the already-registered projection and would be
    // rewritten to read the very parquet it is about to overwrite
    // (read-while-overwrite). Disable the rule for the build plan.
    val prev = spark.conf.getOption("spark.graft.projections.enabled")
    spark.conf.set("spark.graft.projections.enabled", "false")
    try partialAgg(spark.read.parquet(basePath), keys, measures)
      .write.mode("overwrite").parquet(projPath)
    finally prev match {
      case Some(v) => spark.conf.set("spark.graft.projections.enabled", v)
      case None    => spark.conf.unset("spark.graft.projections.enabled")
    }
    val d = ProjDef(name, normalize(basePath), normalize(projPath), keys,
      measures, fingerprint(basePath))
    planCache.remove(d.projPath) // re-defined projection: refresh the scan
    defs.updateWith(d.basePath) {
      case Some(v) => Some(v.filterNot(_.name == name) :+ d)
      case None    => Some(Vector(d))
    }
    d
  }

  def forPath(path: String): Seq[ProjDef] =
    defs.getOrElse(normalize(path), Vector.empty)

  /** Drop every projection registered over `basePath`. Called by
    * mutation paths (e.g. [[graft.operators.Catalog]] writes) so a
    * stale define-time snapshot can never serve an aggregate after its
    * base changed — the caller re-defines (or maintains a [[graft
    * .operators.MatView]] instead, whose insert path stays fresh).
    */
  def invalidate(basePath: String): Unit = {
    defs.remove(normalize(basePath)).foreach(_.foreach(d =>
      planCache.remove(d.projPath)))
  }

  def clear(): Unit = { defs.clear(); planCache.clear() }

  /** Did the optimizer serve this frame from a registered projection?
    * (Queries gate on this so a silently-not-firing rewrite is a loud
    * error, not a trivially-passing oracle comparison.)
    */
  def servedByProjection(df: DataFrame): Boolean =
    servingProjection(df).isDefined

  /** Which registered projection (by name) serves this frame, if any. */
  def servingProjection(df: DataFrame): Option[String] = {
    val byPath = defs.values.flatten.map(d => d.projPath -> d.name).toMap
    df.queryExecution.optimizedPlan.collectLeaves().collectFirst {
      case lr: LogicalRelation if (lr.relation match {
        case fs: HadoopFsRelation =>
          fs.location.rootPaths.exists(p => byPath.contains(normalize(p.toString)))
        case _ => false
      }) =>
        val fs = lr.relation.asInstanceOf[HadoopFsRelation]
        byPath(fs.location.rootPaths.map(p => normalize(p.toString))
          .find(byPath.contains).get)
    }
  }
}

/** The automatic projection-selection rule. Conf `spark.graft.projections
  * .enabled` (default true — the rule is a no-op unless a base path is
  * registered, mirroring ClickHouse where adding the projection IS the
  * opt-in).
  */
case class ProjectionRewrite(spark: SparkSession) extends Rule[LogicalPlan] {
  import ProjectionCatalog._

  private def enabled: Boolean =
    spark.conf.getOption("spark.graft.projections.enabled").forall(_ == "true")

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan transformDown {
      case agg: Aggregate =>
        tryRewrite(agg).getOrElse(agg)
    }
  }

  /** Peel view aliases / pruning projects, collecting filters, down to a
    * single parquet relation.
    */
  private def peel(p: LogicalPlan, filters: List[Expression])
      : Option[(LogicalRelation, List[Expression])] = p match {
    case SubqueryAlias(_, c) => peel(c, filters)
    case Project(pl, c) if pl.forall(_.isInstanceOf[AttributeReference]) =>
      peel(c, filters)
    case Filter(cond, c) if cond.deterministic => peel(c, cond :: filters)
    case lr: LogicalRelation => Some((lr, filters))
    case _ => None
  }

  private def relationPaths(lr: LogicalRelation): Seq[String] = lr.relation match {
    case fs: HadoopFsRelation => fs.location.rootPaths.map(p => normalize(p.toString))
    case _ => Nil
  }

  private def tryRewrite(agg: Aggregate): Option[LogicalPlan] = {
    val (lr, filters) = peel(agg.child, Nil) match {
      case Some(x) => x
      case None    => return None
    }
    val candidates = relationPaths(lr).flatMap(forPath).filter { d =>
      // Out-of-band base write (bypassing Catalog hooks) → the rollup is
      // stale; drop it and serve the base directly. Self-healing, never
      // silently wrong.
      val fresh = d.baseFingerprint.isEmpty ||
        d.baseFingerprint == ProjectionCatalog.fingerprint(d.basePath)
      if (!fresh) ProjectionCatalog.invalidate(d.basePath)
      fresh
    }
    if (candidates.isEmpty) return None

    // Query grouping keys must all be plain columns.
    val groupNames = agg.groupingExpressions.map {
      case a: AttributeReference => a.name
      case _                     => return None
    }
    val filterRefs = filters.flatMap(_.references.toSeq).map(_.name)

    // Cheapest covering rollup first: fewer keys = fewer rollup rows
    // (the CH projection-selection heuristic).
    candidates.sortBy(_.keys.length).iterator.flatMap { d =>
      if (!groupNames.forall(d.keys.contains) || !filterRefs.forall(d.keys.contains)) None
      else rewriteWith(agg, d, filters)
    }.nextOption()
  }

  private def rewriteWith(agg: Aggregate, d: ProjectionCatalog.ProjDef,
      filters: List[Expression]): Option[LogicalPlan] = {
    val projPlan = ProjectionCatalog.freshProjPlan(spark, d.projPath)
    val projAttr: Map[String, Attribute] = projPlan.output.map(a => a.name -> a).toMap
    def pa(n: String): Attribute = projAttr(n)

    def cAgg(fn: AggregateFunction): Expression =
      AggregateExpression(fn, Complete, isDistinct = false)

    // Rewrite one aggregate function into merged-partial form over the
    // projection columns, preserving the original result dataType.
    def rewriteFn(ae: AggregateExpression): Option[Expression] = {
      if (ae.isDistinct || ae.filter.isDefined) return None
      ae.aggregateFunction match {
        case s @ Sum(e, _) =>
          measureOf(e, d).map { m =>
            val merged = cAgg(Sum(pa(s"__sum_${m.colName}")))
            if (merged.dataType == s.dataType) merged else Cast(merged, s.dataType)
          }
        case Min(a: AttributeReference) if d.hasMeasure(a.name) =>
          Some(cAgg(Min(pa(s"__min_${a.name}"))))
        case Max(a: AttributeReference) if d.hasMeasure(a.name) =>
          Some(cAgg(Max(pa(s"__max_${a.name}"))))
        case Count(Seq(Literal(v, _))) if v != null => // count(NULL) is always 0
          Some(Coalesce(Seq(cAgg(Sum(pa("__cnt"))), Literal(0L))))
        case Count(Seq(a: AttributeReference)) if d.hasMeasure(a.name) =>
          Some(Coalesce(Seq(cAgg(Sum(pa(s"__cnt_${a.name}"))), Literal(0L))))
        case av @ Average(a: AttributeReference, _)
            if d.measureFor(a.name, None).isDefined && av.dataType == DoubleType =>
          Some(Divide(
            Cast(cAgg(Sum(pa(s"__sum_${a.name}"))), DoubleType),
            Cast(cAgg(Sum(pa(s"__cnt_${a.name}"))), DoubleType)))
        case _ => None
      }
    }

    // Rewrite a full select-list expression: AggregateExpressions flip to
    // merged partials (no recursion below them), grouping-key attrs remap
    // to projection attrs, anything else maps over its children.
    def rw(e: Expression): Option[Expression] = e match {
      case ae: AggregateExpression    => rewriteFn(ae)
      case a: AttributeReference      =>
        if (d.keys.contains(a.name)) Some(pa(a.name)) else None
      case other =>
        val kids = other.children.map(rw)
        if (kids.exists(_.isEmpty)) None
        else Some(other.withNewChildren(kids.map(_.get)))
    }

    val newAggExprs: Seq[Option[NamedExpression]] = agg.aggregateExpressions.map {
      case a: AttributeReference if d.keys.contains(a.name) =>
        Some(Alias(pa(a.name), a.name)(exprId = a.exprId))
      case al @ Alias(child, name) =>
        rw(child).map(nc => Alias(nc, name)(exprId = al.exprId))
      case _ => None
    }
    if (newAggExprs.exists(_.isEmpty)) return None

    val newGrouping = agg.groupingExpressions.map {
      case a: AttributeReference => pa(a.name)
      case _                     => return None
    }
    val newChild = filters.foldLeft(projPlan) { (p, cond) =>
      Filter(cond.transform { case a: AttributeReference => pa(a.name) }, p)
    }
    Some(Aggregate(newGrouping, newAggExprs.map(_.get), newChild))
  }

  /** `sum(x)` matches a cast-free measure; `sum(cast(x as T))` matches a
    * measure registered with exactly that cast (the exact-decimal oracle
    * pattern).
    */
  private def measureOf(e: Expression, d: ProjectionCatalog.ProjDef)
      : Option[ProjectionCatalog.Measure] = e match {
    case a: AttributeReference => d.measureFor(a.name, None)
    case c: Cast => c.child match {
      case a: AttributeReference => d.measureFor(a.name, Some(c.dataType))
      case _ => None
    }
    case _ => None
  }
}
