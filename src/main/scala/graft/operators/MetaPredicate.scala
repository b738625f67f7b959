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
  * String, Boolean. `contain` (array columns) and timestamp literals stay
  * on the DataFrame path — pinning variable-length arrays per row would
  * wreck the packed layout for a comparator the serving workload doesn't
  * use on hot metadata.
  *
  * Null contract: pinned metadata must be NON-NULL (enforced at
  * [[PackedScan.build]]). SQL three-valued logic makes `NOT(x > 5)` and
  * `x <= 5` differ on nulls; requiring non-null metadata keeps the
  * two-valued compiled gate exactly equal to the SQL oracle.
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
        case c => throw new IllegalArgumentException(s"in on column '$a' ($c)")
      }

      case Contain(_, _) => unsupported("contain (array membership)")
      case _             => unsupported(s"comparator $node")
    }
  }

  // canonical pinned kinds: 0 = Long, 1 = Double, 2 = String, 3 = Boolean
  // (shared by every operator that pins metadata — PackedScan, Bm25Index)
  private[operators] def kindOf(t: org.apache.spark.sql.types.DataType,
      name: String): Int = {
    import org.apache.spark.sql.types._
    t match {
      case ByteType | ShortType | IntegerType | LongType => 0
      case FloatType | DoubleType                        => 1
      case StringType                                    => 2
      case BooleanType                                   => 3
      case other => throw new IllegalArgumentException(
        s"metadata column '$name' has unsupported pinned type $other " +
          "(supported: integral, floating, string, boolean)")
    }
  }

  /** Widen a Row value to its canonical kind (build-side boxing only). */
  private[operators] def widen(row: org.apache.spark.sql.Row, idx: Int,
      kind: Int): Any = kind match {
    case 0 => row.get(idx).asInstanceOf[Number].longValue()
    case 1 => row.get(idx).asInstanceOf[Number].doubleValue()
    case 2 => row.getString(idx)
    case 3 => row.getBoolean(idx)
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
