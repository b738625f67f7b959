package graft.operators

/** Compiles a [[SelfQueryFilter]] AST against PINNED metadata columns —
  * the predicate half of filtered ANN serving.
  *
  * The reference's dominant query shape is a structured filter composed
  * with a vector top-k: self-query emits `PREWHERE where_str ORDER BY
  * distance(...) LIMIT k` (`app/backend/vector_store/
  * myscale_without_metadata.py:20-36`), and every private-KB retrieval
  * filters `user_id = ... AND file_name IN (...)`
  * (`app/backend/chat_bot/private_knowledge_base.py:161`). On the
  * DataFrame path Catalyst already composes [[SelfQueryFilter.compile]]
  * below the distance sort (q21); this gives the PINNED serving path
  * ([[PackedScan]]) the same capability: metadata columns are packed as
  * primitive arrays beside the vectors, and the AST binds ONCE per block
  * to a monomorphic `Int => Boolean` row gate evaluated before any
  * distance work — filter first, distance only on survivors, exactly the
  * PREWHERE contract.
  *
  * Supported pinned types: integral (as Long), floating (as Double),
  * String, Boolean, timestamps (as epoch-micro Long — both
  * session-timezone TIMESTAMP and TIMESTAMP_NTZ), and
  * list[string] / list[integral] for the `contain` comparator — the
  * reference's two most realistic self-query attributes are a `pubdate`
  * timestamp and an `authors` list (`docs/self-query.md:196,201`;
  * comparator semantics incl. `contain` at `docs/self-query.md:161-178`),
  * so both ride the pinned path. Arrays are pinned OFFSET-PACKED (one
  * starts[] + one flat sorted values[] per column — no per-row object
  * graph), with `contain` a per-row range binary search; element order is
  * NOT preserved, so arrays support membership only (ordered comparators
  * on an array column are a bind-time error).
  *
  * Timestamp literals bind through Spark's own string→timestamp parser
  * (`DateTimeUtils`) in the JVM-default zone — the same zone
  * `to_timestamp` uses under the default `spark.sql.session.timeZone`,
  * so the pinned gate, the DataFrame path, and the oracle's
  * `TIMESTAMP '...'` literal agree. A deployment that overrides the
  * session timezone away from the executor JVM zone gets a LOUD
  * bind-time error (asserted by MetaPredicateSpec, not just documented)
  * telling it to pin NTZ columns instead — the naive comparison is
  * zone-free.
  *
  * Null contract: pinned metadata must be NON-NULL (enforced at
  * [[PackedScan.build]]), including array ELEMENTS. SQL three-valued
  * logic makes `NOT(x > 5)` and `x <= 5` differ on nulls; requiring
  * non-null metadata keeps the two-valued compiled gate exactly equal to
  * the SQL oracle.
  */
object MetaPredicate {

  /** One pinned metadata column: a primitive (or String) array with one
    * slot per packed row, parallel to `Block.ids`.
    */
  sealed trait Col extends Serializable { def length: Int }
  final case class LongCol(v: Array[Long]) extends Col { def length: Int = v.length }
  final case class DoubleCol(v: Array[Double]) extends Col { def length: Int = v.length }
  final case class StringCol(v: Array[String]) extends Col { def length: Int = v.length }
  final case class BoolCol(v: Array[Boolean]) extends Col { def length: Int = v.length }
  /** Epoch-micro timestamps; `ntz` = naive (TIMESTAMP_NTZ) vs session-
    * zone instant — decides how a `T` literal converts at bind.
    */
  final case class TimeCol(v: Array[Long], ntz: Boolean) extends Col { def length: Int = v.length }
  /** Offset-packed string lists: row i's elements are
    * values[starts(i) until starts(i+1)], SORTED for binary search.
    */
  final case class StringArrCol(starts: Array[Int], values: Array[String]) extends Col {
    def length: Int = starts.length - 1
  }
  /** Offset-packed integral lists (same layout as [[StringArrCol]]). */
  final case class LongArrCol(starts: Array[Int], values: Array[Long]) extends Col {
    def length: Int = starts.length - 1
  }

  import SelfQueryFilter._

  /** Bind `node` to the block's columns: resolves every attribute and
    * value type ONCE, returning a closure tree over primitive arrays.
    * Throws IllegalArgumentException for unknown columns, type
    * mismatches, or comparators the pinned path does not support.
    */
  def bind(node: Node, cols: Map[String, Col]): Int => Boolean = {
    def resolve(a: String): Col = cols.getOrElse(a,
      throw new IllegalArgumentException(
        s"column '$a' is not pinned (have: ${cols.keys.toSeq.sorted.mkString(", ")})"))

    def unsupported(what: String): Nothing =
      throw new IllegalArgumentException(
        s"$what is not supported on the pinned serving path; use the DataFrame path (SelfQueryFilter.compile)")

    // three-way comparison col[i] vs literal, for the ordered comparators;
    // integral-vs-integral compares as Long (exact), anything else as
    // Double / String — the same widening SQL comparison uses
    def cmp(a: String, value: Value): Int => Int = (resolve(a), value) match {
      case (LongCol(xs), I(y))   => i => java.lang.Long.compare(xs(i), y)
      case (LongCol(xs), D(y))   => i => java.lang.Double.compare(xs(i).toDouble, y)
      case (DoubleCol(xs), I(y)) => val d = y.toDouble; i => java.lang.Double.compare(xs(i), d)
      case (DoubleCol(xs), D(y)) => i => java.lang.Double.compare(xs(i), y)
      case (StringCol(xs), S(y)) => i => xs(i).compareTo(y)
      case (TimeCol(xs, ntz), T(y)) =>
        val m = tsMicros(y, ntz); i => java.lang.Long.compare(xs(i), m)
      case (c, v) => throw new IllegalArgumentException(
        s"cannot compare pinned ${c.getClass.getSimpleName} column '$a' with $v")
    }

    node match {
      case And(cs) =>
        val ps = cs.map(bind(_, cols)).toArray
        i => { var j = 0; var ok = true; while (ok && j < ps.length) { ok = ps(j)(i); j += 1 }; ok }
      case Or(cs) =>
        val ps = cs.map(bind(_, cols)).toArray
        i => { var j = 0; var ok = false; while (!ok && j < ps.length) { ok = ps(j)(i); j += 1 }; ok }
      case Not(c) =>
        val p = bind(c, cols); i => !p(i)

      case Eq(a, B(y)) => resolve(a) match {
        case BoolCol(xs) => i => xs(i) == y
        case c => throw new IllegalArgumentException(s"eq(bool) on non-bool column '$a' ($c)")
      }
      case Ne(a, B(y)) => resolve(a) match {
        case BoolCol(xs) => i => xs(i) != y
        case c => throw new IllegalArgumentException(s"ne(bool) on non-bool column '$a' ($c)")
      }
      case Eq(a, v)  => val c = cmp(a, v); i => c(i) == 0
      case Ne(a, v)  => val c = cmp(a, v); i => c(i) != 0
      case Gt(a, v)  => val c = cmp(a, v); i => c(i) > 0
      case Gte(a, v) => val c = cmp(a, v); i => c(i) >= 0
      case Lt(a, v)  => val c = cmp(a, v); i => c(i) < 0
      case Lte(a, v) => val c = cmp(a, v); i => c(i) <= 0

      case Like(a, p) => resolve(a) match {
        case StringCol(xs) =>
          val rx = java.util.regex.Pattern.compile(likeToRegex(p),
            java.util.regex.Pattern.DOTALL)
          i => rx.matcher(xs(i)).matches()
        case c => throw new IllegalArgumentException(s"like on non-string column '$a' ($c)")
      }

      case In(a, vs) => resolve(a) match {
        case LongCol(xs) =>
          val set = vs.map { case I(y) => y; case other =>
            throw new IllegalArgumentException(s"in-list value $other for integral column '$a'")
          }.toSet
          i => set.contains(xs(i))
        case DoubleCol(xs) =>
          val set = vs.map { case I(y) => y.toDouble; case D(y) => y; case other =>
            throw new IllegalArgumentException(s"in-list value $other for double column '$a'")
          }.toSet
          i => set.contains(xs(i))
        case StringCol(xs) =>
          val set = vs.map { case S(y) => y; case other =>
            throw new IllegalArgumentException(s"in-list value $other for string column '$a'")
          }.toSet
          i => set.contains(xs(i))
        case TimeCol(xs, ntz) =>
          val set = vs.map { case T(y) => tsMicros(y, ntz); case other =>
            throw new IllegalArgumentException(s"in-list value $other for timestamp column '$a'")
          }.toSet
          i => set.contains(xs(i))
        case c => throw new IllegalArgumentException(s"in on column '$a' ($c)")
      }

      case Contain(a, v) => (resolve(a), v) match {
        case (StringArrCol(starts, values), S(y)) =>
          val vs = values.asInstanceOf[Array[AnyRef]]
          val key = y.asInstanceOf[AnyRef]
          i => java.util.Arrays.binarySearch(vs, starts(i), starts(i + 1), key) >= 0
        case (LongArrCol(starts, values), I(y)) =>
          i => java.util.Arrays.binarySearch(values, starts(i), starts(i + 1), y) >= 0
        case (c, _) => throw new IllegalArgumentException(
          s"contain needs an array-typed pinned column whose element type matches " +
            s"the literal; column '$a' is ${c.getClass.getSimpleName}, literal $v")
      }

      case _ => unsupported(s"comparator $node")
    }
  }

  /** Spark's own string→timestamp parse, so a pinned `T` literal means
    * exactly what `to_timestamp(lit(v))` means: naive micros for NTZ
    * columns, JVM-default-zone instant micros otherwise (see class doc
    * for the session-timezone contract).
    */
  private def tsMicros(s: String, ntz: Boolean): Long = {
    import org.apache.spark.sql.catalyst.util.DateTimeUtils
    val u = org.apache.spark.unsafe.types.UTF8String.fromString(s)
    val parsed =
      if (ntz) DateTimeUtils.stringToTimestampWithoutTimeZone(u)
      else {
        // LOUD bind-time contract check (r8 verdict item 6 — previously
        // only a class-doc footgun): session-zone TIMESTAMP literals
        // parse in the JVM-default zone (matching what `to_timestamp`
        // does under the DEFAULT spark.sql.session.timeZone), so a
        // session that overrides the timezone away from the executor JVM
        // zone would silently shift every pinned comparison. Refuse at
        // bind; NTZ-pinned columns are the zone-free alternative.
        val jvm = java.time.ZoneId.systemDefault()
        sessionZoneOrNull() match {
          case null => // conf not reachable here: default zone semantics
          case sz =>
            val szId = java.time.ZoneId.of(sz)
            if (szId.getRules != jvm.getRules)
              throw new IllegalArgumentException(
                s"pinned session-zone timestamp comparison requires " +
                s"spark.sql.session.timeZone ('$sz') to match the JVM zone " +
                s"('${jvm.getId}'); pin the column as TIMESTAMP_NTZ for " +
                s"zone-free comparison, or align the session timezone")
        }
        DateTimeUtils.stringToTimestamp(u, jvm)
      }
    parsed.getOrElse(throw new IllegalArgumentException(
      s"cannot parse timestamp literal '$s'"))
  }

  /** Active session timezone, driver or executor side (SQLConf propagates
    * to tasks); null when no conf is reachable (pure-library use).
    */
  private def sessionZoneOrNull(): String =
    try org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone
    catch { case _: Throwable => null }

  // canonical pinned kinds: 0 = Long, 1 = Double, 2 = String, 3 = Boolean,
  // 4 = Timestamp (session-zone), 5 = Timestamp NTZ, 6 = list[string],
  // 7 = list[integral]
  // (shared by every operator that pins metadata — PackedScan, Bm25Index,
  // GraphAnn/IvfGraph)
  private[operators] def kindOf(t: org.apache.spark.sql.types.DataType,
      name: String): Int = {
    import org.apache.spark.sql.types._
    t match {
      case ByteType | ShortType | IntegerType | LongType => 0
      case FloatType | DoubleType                        => 1
      case StringType                                    => 2
      case BooleanType                                   => 3
      case TimestampType                                 => 4
      case TimestampNTZType                              => 5
      case ArrayType(StringType, _)                      => 6
      case ArrayType(ByteType | ShortType | IntegerType | LongType, _) => 7
      case other => throw new IllegalArgumentException(
        s"metadata column '$name' has unsupported pinned type $other " +
          "(supported: integral, floating, string, boolean, timestamp, " +
          "list[string], list[integral])")
    }
  }

  /** Widen a Row value to its canonical kind (build-side boxing only).
    * Timestamps widen to epoch micros via Spark's own converters; arrays
    * widen to a SORTED copy (membership-only contract, see class doc).
    */
  private[operators] def widen(row: org.apache.spark.sql.Row, idx: Int,
      kind: Int): Any = kind match {
    case 0 => row.get(idx).asInstanceOf[Number].longValue()
    case 1 => row.get(idx).asInstanceOf[Number].doubleValue()
    case 2 => row.getString(idx)
    case 3 => row.getBoolean(idx)
    case 4 | 5 =>
      import org.apache.spark.sql.catalyst.util.DateTimeUtils
      row.get(idx) match {
        case t: java.sql.Timestamp      => DateTimeUtils.fromJavaTimestamp(t)
        case i: java.time.Instant       => DateTimeUtils.instantToMicros(i)
        case l: java.time.LocalDateTime => DateTimeUtils.localDateTimeToMicros(l)
        case other => throw new IllegalArgumentException(
          s"unexpected timestamp representation ${other.getClass.getName}")
      }
    case 6 =>
      val xs = row.getSeq[String](idx).toArray
      require(!xs.contains(null), "null element in pinned list[string] metadata")
      java.util.Arrays.sort(xs.asInstanceOf[Array[AnyRef]])
      xs
    case 7 =>
      val raw = row.getSeq[Any](idx)
      require(!raw.contains(null), "null element in pinned list[integral] metadata")
      val xs = raw.iterator.map(_.asInstanceOf[Number].longValue()).toArray
      java.util.Arrays.sort(xs)
      xs
  }

  /** Widen one row's metadata columns (slots `base until base+names.length`)
    * enforcing the non-null contract — the ONE row-ingest loop shared by
    * every structure that pins metadata (PackedScan, GraphAnn, IvfGraph),
    * so the null/widening rules cannot drift between build paths.
    * `idIdx` names the row's id slot for the error message.
    */
  private[operators] def widenRow(row: org.apache.spark.sql.Row, base: Int,
      idIdx: Int, names: Array[String], kinds: Array[Int]): Array[Any] = {
    val m = new Array[Any](names.length)
    var j = 0
    while (j < names.length) {
      require(!row.isNullAt(base + j),
        s"null in pinned metadata column '${names(j)}' (id=${row.getLong(idIdx)})")
      m(j) = widen(row, base + j, kinds(j))
      j += 1
    }
    m
  }

  /** Pack canonically-widened values into a typed [[Col]]. */
  private[operators] def packCol(kind: Int, values: Array[Any]): Col =
    kind match {
      case 0 => LongCol(values.map(_.asInstanceOf[Long]))
      case 1 => DoubleCol(values.map(_.asInstanceOf[Double]))
      case 2 => StringCol(values.map(_.asInstanceOf[String]))
      case 3 => BoolCol(values.map(_.asInstanceOf[Boolean]))
      case 4 => TimeCol(values.map(_.asInstanceOf[Long]), ntz = false)
      case 5 => TimeCol(values.map(_.asInstanceOf[Long]), ntz = true)
      case 6 =>
        val starts = new Array[Int](values.length + 1)
        var i = 0
        while (i < values.length) {
          starts(i + 1) = starts(i) + values(i).asInstanceOf[Array[String]].length
          i += 1
        }
        val flat = new Array[String](starts(values.length))
        i = 0
        while (i < values.length) {
          val a = values(i).asInstanceOf[Array[String]]
          System.arraycopy(a, 0, flat, starts(i), a.length)
          i += 1
        }
        StringArrCol(starts, flat)
      case 7 =>
        val starts = new Array[Int](values.length + 1)
        var i = 0
        while (i < values.length) {
          starts(i + 1) = starts(i) + values(i).asInstanceOf[Array[Long]].length
          i += 1
        }
        val flat = new Array[Long](starts(values.length))
        i = 0
        while (i < values.length) {
          val a = values(i).asInstanceOf[Array[Long]]
          System.arraycopy(a, 0, flat, starts(i), a.length)
          i += 1
        }
        LongArrCol(starts, flat)
    }

  /** Row i's widened value back out of a packed [[Col]] — the inverse of
    * [[packCol]] (array slices stay sorted), shared by every compaction /
    * re-pack path so the round-trip cannot drift per operator.
    */
  private[operators] def valueAt(c: Col, i: Int): Any = c match {
    case LongCol(xs)    => xs(i)
    case DoubleCol(xs)  => xs(i)
    case StringCol(xs)  => xs(i)
    case BoolCol(xs)    => xs(i)
    case TimeCol(xs, _) => xs(i)
    case StringArrCol(starts, values) =>
      java.util.Arrays.copyOfRange(values.asInstanceOf[Array[AnyRef]],
        starts(i), starts(i + 1)).asInstanceOf[Array[String]]
    case LongArrCol(starts, values) =>
      java.util.Arrays.copyOfRange(values, starts(i), starts(i + 1))
  }

  /** The canonical kind a packed [[Col]] was built with. */
  private[operators] def kindOfCol(c: Col): Int = c match {
    case _: LongCol          => 0
    case _: DoubleCol        => 1
    case _: StringCol        => 2
    case _: BoolCol          => 3
    case TimeCol(_, false)   => 4
    case TimeCol(_, true)    => 5
    case _: StringArrCol     => 6
    case _: LongArrCol       => 7
  }

  /** Pinned-byte estimate for [[graft.operators.ServingCache]] budgets. */
  private[operators] def colBytes(c: Col): Long = c match {
    case LongCol(v)    => v.length.toLong * 8
    case DoubleCol(v)  => v.length.toLong * 8
    case BoolCol(v)    => v.length.toLong
    case TimeCol(v, _) => v.length.toLong * 8
    case StringCol(v)  => v.iterator.map(s => 40L + 2L * s.length).sum // object + UTF-16 est.
    case StringArrCol(starts, values) =>
      4L * starts.length + values.iterator.map(s => 40L + 2L * s.length).sum
    case LongArrCol(starts, values) =>
      4L * starts.length + 8L * values.length
  }

  /** Parquet storage type for a pinned kind in a DURABLE artifact.
    * Timestamps persist as their raw epoch-micro longs — the kind,
    * saved beside the data, restores the [[TimeCol]] flavor (incl. the
    * ntz flag) at load, so the artifact itself is zone-free: no
    * session-timezone conversion happens on either side of the disk.
    */
  private[operators] def storageTypeOf(kind: Int): org.apache.spark.sql.types.DataType = {
    import org.apache.spark.sql.types._
    kind match {
      case 0 | 4 | 5 => LongType
      case 1         => DoubleType
      case 2         => StringType
      case 3         => BooleanType
      case 6         => ArrayType(StringType, containsNull = false)
      case 7         => ArrayType(LongType, containsNull = false)
    }
  }

  /** Row i of a packed [[Col]] as its storage representation ([[valueAt]]
    * with arrays re-shaped to the Seq a Row cell wants; slices come out
    * sorted, so the artifact round-trips the binary-searchable layout).
    */
  private[operators] def storedValueAt(c: Col, i: Int): Any = valueAt(c, i) match {
    case a: Array[String] => a.toSeq
    case a: Array[Long]   => a.toSeq
    case v                => v
  }

  /** [[storedValueAt]] in Catalyst INTERNAL form (UTF8String / ArrayData)
    * — the index save paths build InternalRows directly (r18), skipping
    * the per-row runtime converters `createDataFrame(RDD[Row], schema)`
    * runs for every cell.
    */
  private[operators] def internalStoredValueAt(c: Col, i: Int): Any =
    valueAt(c, i) match {
      case s: String =>
        org.apache.spark.unsafe.types.UTF8String.fromString(s)
      case a: Array[String] =>
        new org.apache.spark.sql.catalyst.util.GenericArrayData(
          a.map(org.apache.spark.unsafe.types.UTF8String.fromString(_)
            : Any))
      case a: Array[Long] =>
        org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
          .fromPrimitiveArray(a)
      case v => v // Long / Double / Boolean box as-is
    }

  /** Inverse of [[storedValueAt]]: a stored artifact cell back to the
    * widened in-memory value [[packCol]] expects. No re-sort — the saved
    * slices were sorted (see [[storedValueAt]]) and parquet preserves
    * element order.
    */
  private[operators] def readStored(row: org.apache.spark.sql.Row, idx: Int,
      kind: Int): Any = kind match {
    case 0 | 4 | 5 => row.get(idx).asInstanceOf[Number].longValue()
    case 1 => row.get(idx).asInstanceOf[Number].doubleValue()
    case 2 => row.getString(idx)
    case 3 => row.getBoolean(idx)
    case 6 => row.getSeq[String](idx).toArray
    case 7 => row.getSeq[Any](idx).iterator.map(_.asInstanceOf[Number].longValue()).toArray
  }

  /** SQL LIKE → anchored regex: `%` → `.*`, `_` → `.`, everything else
    * literal (no escape-char support — document-store metadata patterns
    * don't use it; the DataFrame path has full LIKE).
    */
  private[operators] def likeToRegex(p: String): String = {
    val sb = new StringBuilder
    p.foreach {
      case '%' => sb.append(".*")
      case '_' => sb.append('.')
      case ch if "\\.[]{}()*+?^$|".indexOf(ch) >= 0 => sb.append('\\').append(ch)
      case ch => sb.append(ch)
    }
    sb.toString
  }
}
