package org.apache.spark.sql.graft

import scala.collection.concurrent.TrieMap

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** ClickHouse DICTIONARIES: `dictGet('dict', 'attr', key)` — O(1)
  * enrichment lookups that replace dimension joins (ClickHouse
  * "Dictionaries"; `dictGet`/`dictGetOrDefault`/`dictGetOrNull`/
  * `dictHas`).
  *
  * ClickHouse loads the whole dictionary into RAM on EVERY server and
  * serves point lookups from it. The Spark-identical contract is a
  * broadcast: [[DictCatalog.register]] collects the dimension frame once
  * (internal-row form, so string attrs stay `UTF8String` — no per-lookup
  * conversions) and broadcasts one `Map[key -> Array[attr]]` per dict.
  * [[DictGet]] then evaluates as a map probe per row — the same work a
  * ClickHouse flat/hashed dictionary does, and strictly cheaper at scale
  * than the shuffle a dimension join would cost. (For dims too big to
  * broadcast you keep the join; that's also ClickHouse's own guidance.)
  *
  * Miss semantics mirror ClickHouse exactly: `dictGet` returns the type's
  * default value (0 / '' / 0.0), `dictGetOrDefault` the caller's default,
  * `dictGetOrNull` NULL, `dictHas` 0/1-as-boolean.
  */
object DictCatalog {

  final case class Dict(
      name: String,
      keyType: DataType,
      attrNames: Seq[String],
      attrTypes: Seq[DataType],
      bc: Broadcast[Map[Any, Array[Any]]]) {
    def attrIndex(a: String): Int = {
      val i = attrNames.indexOf(a)
      require(i >= 0, s"dictionary '$name' has no attribute '$a' " +
        s"(has: ${attrNames.mkString(", ")})")
      i
    }
  }

  private val dicts = new TrieMap[String, Dict]

  /** Hard cap on dictionary rows (conf `spark.graft.dict.maxRows`).
    * ClickHouse refuses oversized dictionaries loudly; without this a
    * careless register() on a fact table would OOM the driver with no
    * message. Dictionaries are dimensions — a dim bigger than this
    * belongs in a broadcast/shuffle join, not a per-executor map.
    */
  private def maxRows(spark: SparkSession): Int =
    spark.conf.getOption("spark.graft.dict.maxRows").map(_.toInt)
      .getOrElse(2000000)

  /** Load a dimension frame as a dictionary. One collect + one broadcast;
    * re-registering a name replaces it (the CH `SYSTEM RELOAD DICTIONARY`
    * analog).
    */
  def register(spark: SparkSession, name: String, df: DataFrame,
      keyCol: String): Dict = {
    val schema = df.schema
    val keyIdx = schema.fieldIndex(keyCol)
    val attrs = schema.fields.zipWithIndex.filter(_._2 != keyIdx)
    val attrIdx = attrs.map(_._2)
    val attrTypes = attrs.map(_._1.dataType).toSeq
    val cap = maxRows(spark)
    // take(cap+1) instead of collect: bounded driver memory even when the
    // caller points register() at a fact table by mistake.
    val rows = df.queryExecution.toRdd.map(_.copy()).take(cap + 1)
    if (rows.length > cap)
      throw new IllegalArgumentException(
        s"dictionary '$name' exceeds spark.graft.dict.maxRows=$cap rows — " +
        "dictionaries are broadcast to every executor; keep a dimension " +
        "this size in a join instead (or raise the cap explicitly)")
    val map: Map[Any, Array[Any]] = rows.iterator.map { r: InternalRow =>
      val k = r.get(keyIdx, schema(keyIdx).dataType)
      k -> attrIdx.zip(attrTypes).map { case (i, t) => r.get(i, t) }.toArray
    }.toMap
    val d = Dict(name, schema(keyIdx).dataType, attrs.map(_._1.name).toSeq,
      attrTypes, spark.sparkContext.broadcast(map))
    dicts.put(name, d)
    d
  }

  def get(name: String): Dict =
    dicts.getOrElse(name,
      throw new IllegalArgumentException(s"unknown dictionary '$name' " +
        s"(registered: ${dicts.keys.mkString(", ")})"))

  def clear(): Unit = dicts.clear()

  private[graft] def nameArg(e: Expression, what: String): String =
    litString(e, what)

  private[graft] def coerce(d: Dict, key: Expression): Expression =
    coerceKey(d, key)

  private def litString(e: Expression, what: String): String = e match {
    case Literal(s: UTF8String, StringType) => s.toString
    case _ => throw new IllegalArgumentException(
      s"$what must be a string literal, got: $e")
  }

  /** SQL builders (Registry entries). `mode`: 0 = type default on miss,
    * 1 = null on miss, 2 = explicit default (4th arg).
    */
  /** Coerce a probe-key expression to the dictionary's key type. Without
    * this a BIGINT-keyed dict probed with an INT column/literal boxes to
    * Integer, never equals the Long map keys, and silently returns the
    * miss default on every row (r9 ADVICE). Incompatible types fail at
    * bind time instead.
    */
  private def coerceKey(d: Dict, key: Expression): Expression =
    if (!key.resolved || key.dataType == d.keyType) key
    else if (Cast.canCast(key.dataType, d.keyType)) Cast(key, d.keyType)
    else throw new IllegalArgumentException(
      s"dictionary '${d.name}' has key type ${d.keyType.sql} but the probe " +
      s"expression is ${key.dataType.sql} (not castable)")

  def buildGet(args: Seq[Expression], mode: Int): Expression = {
    val d = get(litString(args(0), "dictGet dictionary name"))
    val attr = litString(args(1), "dictGet attribute name")
    val default = if (mode == 2) Some(args(3)) else None
    DictGet(d.name, attr, coerceKey(d, args(2)), default, nullOnMiss = mode == 1,
      d.attrIndex(attr), d.attrTypes(d.attrIndex(attr)), d.bc)
  }

  def buildHas(args: Seq[Expression]): Expression = {
    val d = get(litString(args(0), "dictHas dictionary name"))
    DictHas(d.name, coerceKey(d, args(1)), d.bc)
  }

  /** ClickHouse type-default values for miss-without-default. */
  def typeDefault(dt: DataType): Any = dt match {
    case StringType              => UTF8String.fromString("")
    case LongType                => 0L
    case IntegerType             => 0
    case ShortType               => 0.toShort
    case ByteType                => 0.toByte
    case DoubleType              => 0.0
    case FloatType               => 0.0f
    case BooleanType             => false
    case d: DecimalType          => Decimal(0, d.precision, d.scale)
    case _                       => null
  }
}

/** One dictionary probe, codegen'd: the generated code calls
  * [[DictGet.lookupRaw]] (one map get through a reference object —
  * DictSoak measured the interpreted fallback at 0.84x the codegen'd
  * broadcast join on a 100k-key dim; inlining the probe into the
  * consuming stage closes the boxing/virtual-call overhead around it)
  * and branches to the miss value inline. Falls back to interpreted
  * eval for the explicit-default form only when its default expression
  * itself can't codegen.
  */
case class DictGet(
    dictName: String,
    attrName: String,
    key: Expression,
    default: Option[Expression],
    nullOnMiss: Boolean,
    attrIdx: Int,
    attrType: DataType,
    bc: Broadcast[Map[Any, Array[Any]]])
  extends Expression {

  /** Executor-side probe; null = miss (or stored null, same contract). */
  def lookupRaw(k: Any): AnyRef = bc.value.get(k) match {
    case Some(attrs) => attrs(attrIdx).asInstanceOf[AnyRef]
    case None        => null
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen._
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val self = ctx.addReferenceObj("dictGet", this, classOf[DictGet].getName)
    val keyGen = key.genCode(ctx)
    val javaType = CodeGenerator.javaType(dataType)
    val boxed = CodeGenerator.boxedType(dataType)
    val raw = ctx.freshName("dictRaw")
    val missCode: String = default match {
      case Some(d) =>
        val dGen = d.genCode(ctx)
        s"""
           |${dGen.code}
           |${ev.isNull} = ${dGen.isNull};
           |if (!${ev.isNull}) ${ev.value} = ${dGen.value};
         """.stripMargin
      case None if nullOnMiss => s"${ev.isNull} = true;"
      case None => DictCatalog.typeDefault(dataType) match {
        case null => s"${ev.isNull} = true;"
        case dv =>
          val dfltRef = ctx.addReferenceObj("dictDefault", dv, boxed)
          s"${ev.value} = (($boxed) $dfltRef)$unboxSuffix;"
      }
    }
    ev.copy(code =
      code"""
        |${keyGen.code}
        |Object $raw = ${keyGen.isNull} ? null : $self.lookupRaw(${keyGen.value});
        |boolean ${ev.isNull} = false;
        |$javaType ${ev.value} = ${CodeGenerator.defaultValue(dataType)};
        |if ($raw != null) {
        |  ${ev.value} = (($boxed) $raw)$unboxSuffix;
        |} else {
        |  $missCode
        |}
      """.stripMargin)
  }

  /** Java unbox call for primitive-backed types; object types cast only.
    * (Internal values: TimestampType/DateType are long/int, so the
    * boxed form is java.lang.Long/Integer like the numeric cases.)
    */
  private def unboxSuffix: String = dataType match {
    case LongType | TimestampType | TimestampNTZType => ".longValue()"
    case IntegerType | DateType                      => ".intValue()"
    case ShortType                                   => ".shortValue()"
    case ByteType                                    => ".byteValue()"
    case DoubleType                                  => ".doubleValue()"
    case FloatType                                   => ".floatValue()"
    case BooleanType                                 => ".booleanValue()"
    case _                                           => ""
  }

  override def children: Seq[Expression] = key +: default.toSeq
  override def dataType: DataType = attrType
  override def nullable: Boolean =
    nullOnMiss || default.forall(_.nullable)
  override def prettyName: String =
    if (nullOnMiss) "dictGetOrNull"
    else if (default.isDefined) "dictGetOrDefault" else "dictGet"

  private def onMiss(input: InternalRow): Any = default match {
    case Some(d)             => d.eval(input)
    case None if nullOnMiss  => null
    case None                => DictCatalog.typeDefault(attrType)
  }

  override def eval(input: InternalRow): Any = {
    val k = key.eval(input)
    if (k == null) onMiss(input)
    else bc.value.get(k) match {
      case Some(attrs) =>
        val v = attrs(attrIdx)
        if (v == null) onMiss(input) else v
      case None => onMiss(input)
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(key = newChildren.head,
      default = if (default.isDefined) Some(newChildren(1)) else None)
}

case class DictHas(
    dictName: String,
    key: Expression,
    bc: Broadcast[Map[Any, Array[Any]]])
  extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(key)
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def prettyName: String = "dictHas"

  override def eval(input: InternalRow): Any = {
    val k = key.eval(input)
    k != null && bc.value.contains(k)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(key = newChildren.head)
}

/** `dictGetHierarchy('dict', 'parentAttr', key)`: the ancestor chain
  * [key, parent, grandparent, ...] walked through `parentAttr` until a
  * miss, a null/zero parent, or a CYCLE (seen-set guarded — a corrupt
  * hierarchy terminates instead of spinning). CH declares the
  * hierarchical attribute in the dictionary DDL; graft names it
  * explicitly per call.
  */
case class DictGetHierarchy(
    dictName: String,
    attrIdx: Int,
    attrType: DataType,
    key: Expression,
    bc: Broadcast[Map[Any, Array[Any]]])
  extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(key)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "dictGetHierarchy"

  override def eval(input: InternalRow): Any = {
    val k0 = key.eval(input)
    val out = new scala.collection.mutable.ArrayBuffer[Any](4)
    val seen = new java.util.HashSet[Any]()
    var k = k0
    while (k != null && !seen.contains(k) && bc.value.contains(k)) {
      seen.add(k)
      out += Num.toL(k)
      val parent = bc.value(k)(attrIdx)
      k = parent match {
        case null => null
        case p if Num.toL(p) == 0L => null // CH: 0 terminates the walk
        case p => p
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(key = newChildren.head)
}

object DictHierarchyBuilder {
  /** dictGetHierarchy('dict', 'parentAttr', key) */
  def buildHierarchy(args: Seq[Expression]): Expression = {
    val d = DictCatalog.get(DictCatalog.nameArg(args(0), "dictGetHierarchy"))
    val attr = DictCatalog.nameArg(args(1), "dictGetHierarchy parent attribute")
    val i = d.attrIndex(attr)
    DictGetHierarchy(d.name, i, d.attrTypes(i),
      DictCatalog.coerce(d, args(2)), d.bc)
  }

  /** dictIsIn('dict', 'parentAttr', childKey, ancestorKey): true iff
    * ancestor appears in child's chain (the child itself counts — CH's
    * dictIsIn(child, ancestor) contract).
    */
  def buildIsIn(args: Seq[Expression]): Expression = {
    val h = buildHierarchy(args.take(3))
    org.apache.spark.sql.catalyst.expressions.ArrayContains(
      h, Cast(args(3), LongType))
  }
}
