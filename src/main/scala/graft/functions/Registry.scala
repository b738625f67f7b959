package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry.FunctionBuilder
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.types._
import org.apache.spark.sql.graft.{ChLength, CosineDistance, CosineDistanceF16, CosineDistancePacked, InnerProduct, L2Distance, NeuralArray, ParseDateTimeBestEffort, SimHash64, SumMap, VecPack, VecPackF16, VecUnpack, VecUnpackF16, VectorAvg}

/** SQL surface of the engine: graft natives + the MyScale/ClickHouse
  * dialect shim (SURVEY.md §2.8 — every scalar/aggregate function the
  * reference emits or teaches its LLM to emit, mapped onto Spark
  * expressions so `spark.sql` accepts the reference's Vector-SQL text).
  *
  * Two registration paths, same table: [[graft.plans.GraftExtensions]]
  * (`spark.sql.extensions`, survives session cloning) and
  * [[Registry.registerAll]] (imperative, for sessions the driver builds).
  */
object Registry {

  /** name -> (builder, usage) */
  val functions: Seq[(String, FunctionBuilder, String)] = Seq(
    // --- graft natives -------------------------------------------------
    ("cosine_distance", (e: Seq[Expression]) => CosineDistance(e(0), e(1)),
      "cosine_distance(a, b) - 1 - cos(a,b) over float vectors"),
    // MyScale spells it `distance` / `DISTANCE` (prompts.py:31,
    // myscale_without_metadata.py:32); metric is Cosine in every table DDL.
    ("distance", (e: Seq[Expression]) => CosineDistance(e(0), e(1)),
      "distance(a, b) - MyScale dialect alias of cosine_distance"),
    ("l2_distance", (e: Seq[Expression]) => L2Distance(e(0), e(1)),
      "l2_distance(a, b) - Euclidean distance"),
    ("l2distance", (e: Seq[Expression]) => L2Distance(e(0), e(1)),
      "L2Distance(a, b) - ClickHouse spelling"),
    ("inner_product", (e: Seq[Expression]) => InnerProduct(e(0), e(1)),
      "inner_product(a, b) - dot product"),
    ("dotproduct", (e: Seq[Expression]) => InnerProduct(e(0), e(1)),
      "dotProduct(a, b) - ClickHouse spelling"),
    ("neuralarray", (e: Seq[Expression]) => NeuralArray(e.head),
      "NeuralArray(text) - deterministic text embedding; folds to a literal"),
    ("simhash64", (e: Seq[Expression]) => SimHash64(e.head),
      "simhash64(tokens) - 64-bit Charikar similarity hash of a token array"),
    ("vector_avg", (e: Seq[Expression]) => VectorAvg(e.head),
      "vector_avg(vec) - element-wise mean of float vectors (centroid aggregate)"),
    // Packed vector storage (reference fp16_storage=1, myscale_tables.py:35)
    ("vec_pack", (e: Seq[Expression]) => VecPack(e.head),
      "vec_pack(arr) - array<float> to fp32-packed binary"),
    ("vec_unpack", (e: Seq[Expression]) => VecUnpack(e.head),
      "vec_unpack(bin) - fp32-packed binary to array<float>"),
    ("vec_pack_f16", (e: Seq[Expression]) => VecPackF16(e.head),
      "vec_pack_f16(arr) - array<float> to fp16-packed binary (half bytes)"),
    ("vec_unpack_f16", (e: Seq[Expression]) => VecUnpackF16(e.head),
      "vec_unpack_f16(bin) - fp16-packed binary to array<float>"),
    ("cosine_distance_packed", (e: Seq[Expression]) => CosineDistancePacked(e(0), e(1)),
      "cosine_distance_packed(bin, q) - cosine distance over fp32-packed storage"),
    ("cosine_distance_f16", (e: Seq[Expression]) => CosineDistanceF16(e(0), e(1)),
      "cosine_distance_f16(bin, q) - cosine distance over fp16-packed storage"),
    ("lsh_signature", (e: Seq[Expression]) => {
      // optional 2nd arg = vector dimension (int literal). Without it a
      // >64-d vector would silently hash only its first 64 coordinates
      // (LshSignature truncates at min(len, dim)) — callers with wider
      // embeddings must pass their dim explicitly.
      val dim = if (e.length > 1) e(1) match {
        case Literal(v: Int, org.apache.spark.sql.types.IntegerType) => v
        case other => throw new IllegalArgumentException(
          s"lsh_signature(vec, dim): dim must be an INT literal, got $other")
      } else 64
      org.apache.spark.sql.graft.LshSignature(e.head,
        org.apache.spark.sql.graft.LshSignature.planes(dim), dim)
    },
      "lsh_signature(vec[, dim]) - 64 hyperplane sign bits over a dim-d vector (default 64) as one long"),
    ("cdc_chunks", (e: Seq[Expression]) =>
      org.apache.spark.sql.graft.CdcChunks(e.head, 16, 0x3f),
      "cdc_chunks(text) - content-defined chunk lengths (rolling hash, ~64 B target)"),
    // toJSONString(struct) — docs/vector-sql.md:204
    ("tojsonstring", (e: Seq[Expression]) =>
      StructsToJson(Map.empty, e.head),
      "toJSONString(x) - ClickHouse JSON encode = to_json"),
    ("parsedatetimebesteffort",
      (e: Seq[Expression]) => ParseDateTimeBestEffort(e.head, orNull = false),
      "parseDateTimeBestEffort(s) - ClickHouse best-effort datetime parse"),
    ("parsedatetimebesteffortornull",
      (e: Seq[Expression]) => ParseDateTimeBestEffort(e.head, orNull = true),
      "parseDateTimeBestEffortOrNull(s) - null instead of error"),
    // shorten(s, width) — the reference's display truncation helper
    // (textwrap.shorten, app/backend/callbacks/arxiv_callbacks.py:25):
    // collapse whitespace; if the result exceeds `width`, keep the longest
    // word-prefix that fits alongside the " [...]" placeholder (just
    // "[...]" when not even one word fits). Built compositionally from
    // codegen'd built-ins via the Column bridge — no UDF.
    // KNOWN DIVERGENCE from Python textwrap.shorten: textwrap also breaks
    // on hyphens inside words (break_on_hyphens=True default), so a
    // hyphenated word straddling the limit can truncate mid-word there but
    // not here; this implementation (and its DuckDB oracle twin) break on
    // whitespace only.
    ("shorten", (ex: Seq[Expression]) => {
      // Built from RAW catalyst nodes, not the Column bridge: a bridged
      // ColumnNodeExpression fails to resolve when NESTED inside another
      // dialect function (q116's `length(shorten(text, 80))` hit this —
      // ch_length's RuntimeReplaceable replacement saw an unresolvable
      // columnnodeexpression child).
      val s = ex(0)
      val w = ex(1)
      val collapsed = StringTrim(RegExpReplace(s, Literal("\\s+"), Literal(" ")))
      val words = StringSplit(collapsed, Literal(" "), Literal(-1))
      // longest j with len(join(words[0..j], ' ')) <= width - len(" [...]")
      val j = UnresolvedNamedLambdaVariable(Seq("j"))
      val fits = LessThanOrEqual(
        Length(ConcatWs(Seq(Literal(" "), Slice(words, Literal(1), j)))),
        Subtract(w, Literal(6)))
      val jmax = ArrayMax(ArrayFilter(
        Sequence(Literal(1), Size(words, legacySizeOfNull = false), None, None),
        LambdaFunction(fits, Seq(j))))
      val prefix = If(IsNull(jmax), Literal(""),
        ConcatWs(Seq(Literal(" "), Slice(words, Literal(1), jmax))))
      If(LessThanOrEqual(Length(collapsed), w), collapsed,
        If(EqualTo(prefix, Literal("")), Literal("[...]"),
          Concat(Seq(prefix, Literal(" [...]")))))
    },
      "shorten(s, width) - whitespace-collapsed word-boundary truncation with [...] placeholder"),
    // --- ClickHouse dialect aliases onto Spark built-ins ---------------
    // has(arr, x) — prompts.py:100 `has(authors, 'Geoffrey Hinton')`
    ("has", (e: Seq[Expression]) => ArrayContains(e(0), e(1)),
      "has(arr, x) - ClickHouse array membership = array_contains"),
    // arrayJoin(arr) — private_knowledge_base.py:146; a generator (explode)
    ("arrayjoin", (e: Seq[Expression]) => Explode(e.head),
      "arrayJoin(arr) - ClickHouse row-expansion = explode"),
    // groupArray(x) — private_knowledge_base.py:75
    ("grouparray", (e: Seq[Expression]) => CollectList(e.head),
      "groupArray(x) - ClickHouse collect-to-array aggregate = collect_list"),
    // arrayElement(arr, i) — ClickHouse arr[i], 1-based (Spark SQL's
    // arr[i] is 0-based; element_at is the 1-based equivalent)
    ("arrayelement", (e: Seq[Expression]) => ElementAt(e(0), e(1)),
      "arrayElement(arr, i) - ClickHouse 1-based indexing = element_at"),
    // arrayMax / arrayMin — private_knowledge_base.py:75
    ("arraymax", (e: Seq[Expression]) => ArrayMax(e.head),
      "arrayMax(arr) = array_max"),
    ("arraymin", (e: Seq[Expression]) => ArrayMin(e.head),
      "arrayMin(arr) = array_min"),
    // arrayMap(x -> f(x), arr) — ClickHouse puts the lambda FIRST;
    // Spark's transform(arr, lambda) puts it second (docs/vector-sql.md:206).
    ("arraymap", (e: Seq[Expression]) => ArrayTransform(e(1), e(0)),
      "arrayMap(x -> f(x), arr) = transform(arr, x -> f(x))"),
    ("arrayfilter", (e: Seq[Expression]) => ArrayFilter(e(1), e(0)),
      "arrayFilter(x -> p(x), arr) = filter(arr, p)"),
    // --- ClickHouse array-function family ------------------------------
    // (ClickHouse "Array functions" — the text/token manipulation surface
    // its SQL users lean on; every alias maps onto a codegen'd Spark
    // collection expression, or composes them with raw lambda nodes the
    // way `shorten` above does.)
    ("arraydistinct", (e: Seq[Expression]) => ArrayDistinct(e.head),
      "arrayDistinct(arr) - first-occurrence-order dedup = array_distinct"),
    ("arraysort", (e: Seq[Expression]) => new SortArray(e.head),
      "arraySort(arr) - ascending = sort_array"),
    ("arrayreversesort", (e: Seq[Expression]) =>
      SortArray(e.head, Literal(false)),
      "arrayReverseSort(arr) - descending sort"),
    ("arrayreverse", (e: Seq[Expression]) => Reverse(e.head),
      "arrayReverse(arr) = reverse"),
    ("arraystringconcat", (e: Seq[Expression]) =>
      if (e.length > 1) ArrayJoin(e(0), e(1), None)
      else ArrayJoin(e(0), Literal(""), None),
      "arrayStringConcat(arr[, sep]) = array_join"),
    // ClickHouse puts the SEPARATOR first; Spark split takes a regex, so
    // the char is quoted
    ("splitbychar", (e: Seq[Expression]) => {
      val sep = e.head match {
        case Literal(u, org.apache.spark.sql.types.StringType) if u != null =>
          u.toString
        case other => throw new IllegalArgumentException(
          s"splitByChar(sep, s): sep must be a string literal, got $other")
      }
      StringSplit(e(1), Literal(java.util.regex.Pattern.quote(sep)), Literal(-1))
    }, "splitByChar(sep, s) - split on a literal character"),
    ("arrayslice", (e: Seq[Expression]) => Slice(e(0), e(1), e(2)),
      "arraySlice(arr, offset, length) - 1-based = slice"),
    ("arrayconcat", (e: Seq[Expression]) => Concat(e),
      "arrayConcat(a, b, ...) = concat"),
    ("arrayflatten", (e: Seq[Expression]) => Flatten(e.head),
      "arrayFlatten(arr) = flatten"),
    ("arraysum", (e: Seq[Expression]) => {
      val acc = UnresolvedNamedLambdaVariable(Seq("acc"))
      val x = UnresolvedNamedLambdaVariable(Seq("x"))
      val fin = UnresolvedNamedLambdaVariable(Seq("a"))
      ArrayAggregate(e.head, Literal(0.0d),
        LambdaFunction(Add(acc, x), Seq(acc, x)),
        LambdaFunction(fin, Seq(fin)))
    }, "arraySum(arr) - element sum as double (aggregate HOF)"),
    ("arrayavg", (e: Seq[Expression]) => {
      val acc = UnresolvedNamedLambdaVariable(Seq("acc"))
      val x = UnresolvedNamedLambdaVariable(Seq("x"))
      val fin = UnresolvedNamedLambdaVariable(Seq("a"))
      Divide(
        ArrayAggregate(e.head, Literal(0.0d),
          LambdaFunction(Add(acc, x), Seq(acc, x)),
          LambdaFunction(fin, Seq(fin))),
        Cast(Size(e.head, legacySizeOfNull = false),
          org.apache.spark.sql.types.DoubleType))
    }, "arrayAvg(arr) - element mean as double"),
    // consecutive-duplicate removal: keep position i (0-based) when i = 0
    // or the element differs from its predecessor (element_at is 1-based,
    // so element_at(arr, i) IS the predecessor of 0-based position i)
    ("arraycompact", (e: Seq[Expression]) => {
      val x = UnresolvedNamedLambdaVariable(Seq("x"))
      val i = UnresolvedNamedLambdaVariable(Seq("i"))
      ArrayFilter(e.head, LambdaFunction(
        Or(EqualTo(i, Literal(0)), Not(EqualTo(x, ElementAt(e.head, i)))),
        Seq(x, i)))
    }, "arrayCompact(arr) - drop consecutive duplicate elements"),
    ("indexof", (e: Seq[Expression]) => ArrayPosition(e(0), e(1)),
      "indexOf(arr, x) - 1-based position, 0 if absent = array_position"),
    ("countequal", (e: Seq[Expression]) => {
      val x = UnresolvedNamedLambdaVariable(Seq("x"))
      Size(ArrayFilter(e(0), LambdaFunction(EqualTo(x, e(1)), Seq(x))),
        legacySizeOfNull = false)
    }, "countEqual(arr, x) - occurrences of x in arr"),
    ("arraypushback", (e: Seq[Expression]) =>
      Concat(Seq(e(0), CreateArray(Seq(e(1))))),
      "arrayPushBack(arr, x)"),
    ("arraypushfront", (e: Seq[Expression]) =>
      Concat(Seq(CreateArray(Seq(e(1))), e(0))),
      "arrayPushFront(arr, x)"),
    ("arrayenumerate", (e: Seq[Expression]) => {
      val n = Size(e.head, legacySizeOfNull = false)
      If(LessThanOrEqual(n, Literal(0)),
        Literal.create(Array.emptyIntArray,
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.IntegerType)),
        Sequence(Literal(1), n, None, None))
    }, "arrayEnumerate(arr) - [1, 2, ..., length(arr)]"),
    ("hasall", (e: Seq[Expression]) =>
      EqualTo(Size(ArrayExcept(e(1), e(0)), legacySizeOfNull = false), Literal(0)),
      "hasAll(arr, sub) - every element of sub present in arr"),
    ("hasany", (e: Seq[Expression]) => ArraysOverlap(e(0), e(1)),
      "hasAny(a, b) - arrays share an element = arrays_overlap"),
    ("empty", (e: Seq[Expression]) => EqualTo(ChLength(e.head), Literal(0)),
      "empty(x) - zero-length string or array"),
    ("notempty", (e: Seq[Expression]) =>
      GreaterThan(ChLength(e.head), Literal(0)),
      "notEmpty(x) - non-empty string or array"),
    ("groupuniqarray", (e: Seq[Expression]) => CollectSet(e.head),
      "groupUniqArray(x) - distinct values as array = collect_set (unordered)"),
    // --- ClickHouse array HOFs (lambda FIRST, as arrayMap above) -------
    ("arrayexists", (e: Seq[Expression]) => ArrayExists(e(1), e(0)),
      "arrayExists(p, arr) - any element satisfies p"),
    ("arrayall", (e: Seq[Expression]) => ArrayForAll(e(1), e(0)),
      "arrayAll(p, arr) - every element satisfies p"),
    // NB the analyzer REQUIRES a function whose call carries a lambda
    // argument to resolve to a HigherOrderFunction at the TOP level
    // (ResolveFunctions' invalid-lambda check), so these three fold
    // through ArrayAggregate instead of wrapping Size/element_at around
    // the filter
    ("arraycount", (e: Seq[Expression]) => {
      val acc = UnresolvedNamedLambdaVariable(Seq("acc"))
      val x = UnresolvedNamedLambdaVariable(Seq("x"))
      val fin = UnresolvedNamedLambdaVariable(Seq("a"))
      ArrayAggregate(ArrayFilter(e(1), e(0)), Literal(0),
        LambdaFunction(Add(acc, Literal(1)), Seq(acc, x)),
        LambdaFunction(fin, Seq(fin)))
    }, "arrayCount(p, arr) - elements satisfying p"),
    // NB ClickHouse arrayFirst returns the TYPE DEFAULT (0, '') when
    // nothing matches; this dialect returns NULL (the Spark/SQL idiom) —
    // documented divergence, mirrored by the oracle
    ("arrayfirst", (e: Seq[Expression]) => {
      val acc = UnresolvedNamedLambdaVariable(Seq("acc"))
      val x = UnresolvedNamedLambdaVariable(Seq("x"))
      val fin = UnresolvedNamedLambdaVariable(Seq("a"))
      // keep-first fold over the filtered array. The zero must carry the
      // ELEMENT type (ArrayAggregate rejects an untyped NULL) — a
      // null-safe out-of-bounds read of the input array is a typed NULL
      ArrayAggregate(ArrayFilter(e(1), e(0)),
        new GetArrayItem(e(1), Literal(-1), false),
        LambdaFunction(If(IsNull(acc), x, acc), Seq(acc, x)),
        LambdaFunction(fin, Seq(fin)))
    }, "arrayFirst(p, arr) - first element satisfying p, NULL if none"),
    ("arrayfirstindex", (e: Seq[Expression]) => {
      val i = UnresolvedNamedLambdaVariable(Seq("i"))
      val acc = UnresolvedNamedLambdaVariable(Seq("acc"))
      val j = UnresolvedNamedLambdaVariable(Seq("j"))
      val fin = UnresolvedNamedLambdaVariable(Seq("a"))
      // first-match fold over the array's own 1-based indices (transform
      // with the 2-arg index lambda — empty in, empty out, unlike a
      // sequence(1, 0) which would run DESCENDING): probe the user
      // predicate through a one-element arrayExists (nested HOFs bind
      // fine; only the TOP level must be one)
      val xv = UnresolvedNamedLambdaVariable(Seq("xv"))
      val iv = UnresolvedNamedLambdaVariable(Seq("iv"))
      ArrayAggregate(
        ArrayFilter(
          ArrayTransform(e(1),
            LambdaFunction(Add(iv, Literal(1)), Seq(xv, iv))),
          LambdaFunction(
            ArrayExists(CreateArray(Seq(ElementAt(e(1), i))), e(0)), Seq(i))),
        Literal(0),
        LambdaFunction(If(GreaterThan(acc, Literal(0)), acc, j), Seq(acc, j)),
        LambdaFunction(fin, Seq(fin)))
    }, "arrayFirstIndex(p, arr) - 1-based index of first match, 0 if none"),
    ("arrayintersect", (e: Seq[Expression]) =>
      e.reduceLeft((a, b) => ArrayIntersect(a, b)),
      "arrayIntersect(a, b, ...) - distinct common elements, first-array order"),
    ("arrayuniq", (e: Seq[Expression]) =>
      Size(ArrayDistinct(e.head), legacySizeOfNull = false),
      "arrayUniq(arr) - number of distinct elements"),
    // arrayDifference([a0, a1, ...]) = [0, a1-a0, ...]; element_at is
    // 1-based so element_at(arr, i) IS the predecessor of 0-based i
    ("arraydifference", (e: Seq[Expression]) => {
      val x = UnresolvedNamedLambdaVariable(Seq("x"))
      val i = UnresolvedNamedLambdaVariable(Seq("i"))
      ArrayTransform(e.head, LambdaFunction(
        If(EqualTo(i, Literal(0)), Literal(0.0d),
          Subtract(x, ElementAt(e.head, i))), Seq(x, i)))
    }, "arrayDifference(arr) - [0, a1-a0, a2-a1, ...] as double"),
    // arrayCumSum via the aggregate HOF with an ARRAY accumulator:
    // acc_k = concat(acc, [last(acc, 0) + x]) — one pass, no n^2
    ("arraycumsum", (e: Seq[Expression]) => {
      val acc = UnresolvedNamedLambdaVariable(Seq("acc"))
      val x = UnresolvedNamedLambdaVariable(Seq("x"))
      val fin = UnresolvedNamedLambdaVariable(Seq("a"))
      ArrayAggregate(e.head,
        Literal.create(Array.emptyDoubleArray,
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType, containsNull = false)),
        LambdaFunction(
          Concat(Seq(acc, CreateArray(Seq(Add(
            // guarded last-element read: element_at(empty, -1) throws
            // under ANSI; 0-based GetArrayItem(size-1) is null-safe and
            // the Coalesce supplies the running-sum seed
            Coalesce(Seq(
              new GetArrayItem(acc,
                Subtract(Size(acc, legacySizeOfNull = false), Literal(1)), false),
              Literal(0.0d))), x))))),
          Seq(acc, x)),
        LambdaFunction(fin, Seq(fin)))
    }, "arrayCumSum(arr) - running sums as array<double>"),
    // --- ClickHouse string functions -----------------------------------
    ("position", (e: Seq[Expression]) => new StringLocate(e(1), e(0)),
      "position(haystack, needle) - 1-based, 0 if absent = locate"),
    ("positioncaseinsensitive", (e: Seq[Expression]) =>
      new StringLocate(Lower(e(1)), Lower(e(0))),
      "positionCaseInsensitive(haystack, needle)"),
    ("replaceall", (e: Seq[Expression]) => StringReplace(e(0), e(1), e(2)),
      "replaceAll(s, from, to) - literal replace = replace"),
    // replaceOne: first literal occurrence only (no Spark builtin);
    // composed from locate + substring so it stays codegen'd
    ("replaceone", (e: Seq[Expression]) => {
      val pos = new StringLocate(e(1), e(0))
      If(EqualTo(pos, Literal(0)), e(0),
        Concat(Seq(
          Substring(e(0), Literal(1), Subtract(pos, Literal(1))),
          e(2),
          Substring(e(0), Add(pos, Length(e(1))), Literal(Int.MaxValue)))))
    }, "replaceOne(s, from, to) - first occurrence only"),
    ("replaceregexpall", (e: Seq[Expression]) =>
      RegExpReplace(e(0), e(1), e(2)),
      "replaceRegexpAll(s, re, to) = regexp_replace"),
    ("match", (e: Seq[Expression]) => RLike(e(0), e(1)),
      "match(s, re) - regex match anywhere = rlike"),
    // ClickHouse extract: first subpattern if the regex has one, else
    // the whole match
    ("extract", (e: Seq[Expression]) => {
      val group = e(1) match {
        case Literal(u, org.apache.spark.sql.types.StringType)
          if u != null && u.toString.contains("(") => 1
        case _ => 0
      }
      RegExpExtract(e(0), e(1), Literal(group))
    }, "extract(s, re) - first subpattern (or whole match)"),
    ("extractall", (e: Seq[Expression]) => {
      val group = e(1) match {
        case Literal(u, org.apache.spark.sql.types.StringType)
          if u != null && u.toString.contains("(") => 1
        case _ => 0
      }
      RegExpExtractAll(e(0), e(1), Literal(group))
    }, "extractAll(s, re) - all matches as array"),
    ("countsubstrings", (e: Seq[Expression]) =>
      Cast(Divide(
        Subtract(Length(e(0)), Length(StringReplace(e(0), e(1), Literal("")))),
        Length(e(1))), org.apache.spark.sql.types.IntegerType),
      "countSubstrings(s, sub) - non-overlapping occurrences"),
    ("countmatches", (e: Seq[Expression]) => RegExpCount(e(0), e(1)),
      "countMatches(s, re) = regexp_count"),
    ("multisearchany", (e: Seq[Expression]) => {
      val x = UnresolvedNamedLambdaVariable(Seq("x"))
      ArrayExists(e(1), LambdaFunction(Contains(e(0), x), Seq(x)))
    }, "multiSearchAny(s, [needles]) - any needle is a substring"),
    ("splitbystring", (e: Seq[Expression]) => {
      val sep = e.head match {
        case Literal(u, org.apache.spark.sql.types.StringType) if u != null =>
          u.toString
        case other => throw new IllegalArgumentException(
          s"splitByString(sep, s): sep must be a string literal, got $other")
      }
      StringSplit(e(1), Literal(java.util.regex.Pattern.quote(sep)), Literal(-1))
    }, "splitByString(sep, s) - split on a literal separator"),
    ("trimleft", (e: Seq[Expression]) => new StringTrimLeft(e.head),
      "trimLeft(s) = ltrim"),
    ("trimright", (e: Seq[Expression]) => new StringTrimRight(e.head),
      "trimRight(s) = rtrim"),
    ("trimboth", (e: Seq[Expression]) => StringTrim(e.head),
      "trimBoth(s) = trim"),
    ("leftpad", (e: Seq[Expression]) => StringLPad(e(0), e(1), e(2)),
      "leftPad(s, len, pad) = lpad"),
    ("rightpad", (e: Seq[Expression]) => StringRPad(e(0), e(1), e(2)),
      "rightPad(s, len, pad) = rpad"),
    ("lengthutf8", (e: Seq[Expression]) => Length(e.head),
      "lengthUTF8(s) - character length"),
    ("lowerutf8", (e: Seq[Expression]) => Lower(e.head), "lowerUTF8(s)"),
    ("upperutf8", (e: Seq[Expression]) => Upper(e.head), "upperUTF8(s)"),
    // length — overloaded over strings and arrays in ClickHouse (§2.8)
    ("length", (e: Seq[Expression]) => ChLength(e.head),
      "length(x) - ClickHouse overload: chars for strings, size for arrays"),
    // today() — prompts.py:39
    ("today", (_: Seq[Expression]) => CurrentDate(),
      "today() = current_date"),
    // JSONExtractString(json, key) — docs/vector-sql.md:204-209
    ("jsonextractstring",
      (e: Seq[Expression]) =>
        GetJsonObject(e(0), Registry.jsonPath(e.drop(1))),
      "JSONExtractString(json, k...) = get_json_object(json, '$.k...')"),
    ("jsonextractint",
      (e: Seq[Expression]) =>
        Cast(GetJsonObject(e(0), Registry.jsonPath(e.drop(1))),
          org.apache.spark.sql.types.LongType),
      "JSONExtractInt(json, k...) - extract and cast to bigint"),
    ("jsonextractfloat",
      (e: Seq[Expression]) =>
        Cast(GetJsonObject(e(0), Registry.jsonPath(e.drop(1))),
          org.apache.spark.sql.types.DoubleType),
      "JSONExtractFloat(json, k...) - extract and cast to double"),
    // JSONExtractArrayRaw(json, k) — docs/vector-sql.md:206-207. NB: Spark
    // from_json returns PARSED strings (no surrounding quotes) where
    // ClickHouse returns raw JSON fragments; equivalent for the
    // reference's usage (string arrays fed to trim(BOTH '"')).
    ("jsonextractarrayraw",
      (e: Seq[Expression]) =>
        JsonToStructs(
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType),
          Map.empty[String, String],
          GetJsonObject(e(0), Concat(Seq(Literal("$."), e(1))))),
      "JSONExtractArrayRaw(json, k) - JSON array field as array<string>"),
    // Rest of the CH JSON family over the same get_json_object core.
    // Multi-key forms (JSONExtractString(j,'a','b')) join keys into one
    // JSONPath; integer keys would be array indices — string keys only
    // here (the reference's usage; CH needs constant keys too).
    ("jsonhas", (e: Seq[Expression]) =>
      IsNotNull(GetJsonObject(e(0), Registry.jsonPath(e.drop(1)))),
      "JSONHas(json, k...) - key exists (and is non-null)"),
    ("jsonextractbool", (e: Seq[Expression]) =>
      Coalesce(Seq(
        Cast(GetJsonObject(e(0), Registry.jsonPath(e.drop(1))),
          org.apache.spark.sql.types.BooleanType),
        Literal(false))),
      "JSONExtractBool(json, k...) - false on miss (CH default-value rule)"),
    ("jsonextractraw", (e: Seq[Expression]) =>
      GetJsonObject(e(0), Registry.jsonPath(e.drop(1))),
      "JSONExtractRaw(json, k...) - raw fragment (scalars unquoted, " +
        "unlike CH which keeps string quotes)"),
    ("jsonextractkeys", (e: Seq[Expression]) =>
      JsonObjectKeys(if (e.length == 1) e.head
        else GetJsonObject(e(0), Registry.jsonPath(e.drop(1)))),
      "JSONExtractKeys(json[, k...]) - object keys as array<string>"),
    ("jsonlength", (e: Seq[Expression]) => {
      val target = if (e.length == 1) e.head
        else GetJsonObject(e(0), Registry.jsonPath(e.drop(1)))
      Coalesce(Seq(
        LengthOfJsonArray(target),
        Size(JsonObjectKeys(target))))
    }, "JSONLength(json[, k...]) - element count of the array/object"),
    // visitParam* — the legacy simpleJSON spellings (CH keeps both)
    ("visitparamextractstring", (e: Seq[Expression]) =>
      GetJsonObject(e(0), Concat(Seq(Literal("$."), e(1)))),
      "visitParamExtractString = JSONExtractString"),
    ("visitparamextractint", (e: Seq[Expression]) =>
      Cast(GetJsonObject(e(0), Concat(Seq(Literal("$."), e(1)))),
        org.apache.spark.sql.types.LongType),
      "visitParamExtractInt = JSONExtractInt"),
    ("visitparamhas", (e: Seq[Expression]) =>
      IsNotNull(GetJsonObject(e(0), Concat(Seq(Literal("$."), e(1))))),
      "visitParamHas = JSONHas"),
    // --- ClickHouse URL functions ---------------------------------------
    // (CH "URL functions" — regexp compositions over RFC-3986 shape; all
    // codegen'd RegExpExtract/Replace, no UDFs. CH contract: empty string
    // when the part is absent, which RegExpExtract already returns.)
    ("protocol", (e: Seq[Expression]) =>
      RegExpExtract(e.head, Literal("^([a-zA-Z][a-zA-Z0-9+.-]*):"), Literal(1)),
      "protocol(url) - scheme without '://'"),
    ("domain", (e: Seq[Expression]) => Registry.urlDomain(e.head),
      "domain(url) - host (user@ and :port stripped)"),
    ("domainwithoutwww", (e: Seq[Expression]) =>
      RegExpReplace(Registry.urlDomain(e.head), Literal("^www\\."), Literal("")),
      "domainWithoutWWW(url)"),
    ("topleveldomain", (e: Seq[Expression]) =>
      RegExpExtract(Registry.urlDomain(e.head), Literal("\\.([^.]+)$"), Literal(1)),
      "topLevelDomain(url) - last dot-label of the host"),
    ("path", (e: Seq[Expression]) =>
      RegExpExtract(e.head,
        Literal("^(?:[a-zA-Z][a-zA-Z0-9+.-]*:)?//[^/?#]*([^?#]*)"), Literal(1)),
      "path(url) - path without query/fragment"),
    ("pathfull", (e: Seq[Expression]) =>
      RegExpExtract(e.head,
        Literal("^(?:[a-zA-Z][a-zA-Z0-9+.-]*:)?//[^/?#]*([^#]*)"), Literal(1)),
      "pathFull(url) - path including the query string"),
    ("querystring", (e: Seq[Expression]) =>
      RegExpExtract(e.head, Literal("\\?([^#]*)"), Literal(1)),
      "queryString(url) - text after '?' (no '?', no fragment)"),
    ("fragment", (e: Seq[Expression]) =>
      RegExpExtract(e.head, Literal("#(.*)$"), Literal(1)),
      "fragment(url) - text after '#'"),
    ("extracturlparameter", (e: Seq[Expression]) => e(1) match {
      case Literal(u, org.apache.spark.sql.types.StringType) if u != null =>
        RegExpExtract(e.head,
          Literal("[?&]" + java.util.regex.Pattern.quote(u.toString) +
            "=([^&#]*)"), Literal(1))
      case other => throw new IllegalArgumentException(
        s"extractURLParameter(url, name): name must be a string literal, got $other")
    }, "extractURLParameter(url, 'name') - value of one query parameter"),
    ("cutquerystring", (e: Seq[Expression]) =>
      RegExpReplace(e.head, Literal("\\?[^#]*"), Literal("")),
      "cutQueryString(url) - url without '?...' (fragment kept)"),
    ("cutfragment", (e: Seq[Expression]) =>
      RegExpReplace(e.head, Literal("#.*$"), Literal("")),
      "cutFragment(url) - url without '#...'"),
    // --- ClickHouse conditionals / integer arithmetic / conversions -----
    ("multiif", (e: Seq[Expression]) => {
      require(e.length >= 3 && e.length % 2 == 1,
        "multiIf(c1, v1, ..., cN, vN, else) needs odd arity >= 3")
      CaseWhen(e.dropRight(1).grouped(2).map(p => (p(0), p(1))).toSeq,
        Some(e.last))
    }, "multiIf(c1, v1, ..., else) = CASE WHEN chain"),
    // CH intDiv rounds toward negative infinity (floor division); Spark's
    // `div` truncates toward zero — composed exactly over integers via
    // pmod (non-negative remainder), no doubles involved.
    ("intdiv", (e: Seq[Expression]) =>
      IntegralDivide(Subtract(e(0), Pmod(e(0), e(1))), e(1)),
      "intDiv(a, b) - floor division on integers"),
    ("intdivorzero", (e: Seq[Expression]) =>
      If(EqualTo(e(1), Literal(0L)), Literal(0L),
        IntegralDivide(Subtract(e(0), Pmod(e(0), e(1))), e(1))),
      "intDivOrZero(a, b) - 0 when b = 0"),
    ("moduloorzero", (e: Seq[Expression]) =>
      If(EqualTo(e(1), Literal(0L)), Literal(0L), Remainder(e(0), e(1))),
      "moduloOrZero(a, b) - a % b, 0 when b = 0"),
    ("toint32", (e: Seq[Expression]) =>
      Cast(e.head, org.apache.spark.sql.types.IntegerType),
      "toInt32(x) = cast int"),
    ("toint64", (e: Seq[Expression]) =>
      Cast(e.head, org.apache.spark.sql.types.LongType),
      "toInt64(x) = cast bigint"),
    ("touint64", (e: Seq[Expression]) =>
      Cast(e.head, org.apache.spark.sql.types.LongType),
      "toUInt64(x) - mapped to bigint (Spark has no unsigned)"),
    ("tofloat32", (e: Seq[Expression]) =>
      Cast(e.head, org.apache.spark.sql.types.FloatType),
      "toFloat32(x) = cast float"),
    ("tofloat64", (e: Seq[Expression]) =>
      Cast(e.head, org.apache.spark.sql.types.DoubleType),
      "toFloat64(x) = cast double"),
    ("tostring", (e: Seq[Expression]) =>
      Cast(e.head, org.apache.spark.sql.types.StringType),
      "toString(x) = cast string"),
    // CH sipHash64/cityHash64: used for sampling/sharding, where the
    // contract is a STABLE uniform hash, not CH's exact bytes — mapped to
    // Spark's codegen'd xxhash64 (deterministic in-engine; NOT
    // byte-compatible with ClickHouse, same caveat as SAMPLE's key hash).
    ("cityhash64", (e: Seq[Expression]) => new XxHash64(e),
      "cityHash64(x...) - stable 64-bit hash (xxhash64, not CH bytes)"),
    // --- ClickHouse aggregate-combinator / parametric aggregates -------
    // (ClickHouse "Aggregate function combinators" -If family and
    // argMax/argMin/uniq/quantile — the analytics surface a MyScale user
    // writes daily. Pure aliases onto Spark's codegen'd aggregates; the
    // -If combinators rewrite to agg(If(cond, x, NULL)), which Spark's
    // partial aggregation map-side-combines like any other agg.)
    ("argmax", (e: Seq[Expression]) => MaxBy(e(0), e(1)),
      "argMax(x, val) - x at the maximum val = max_by"),
    ("argmin", (e: Seq[Expression]) => MinBy(e(0), e(1)),
      "argMin(x, val) - x at the minimum val = min_by"),
    ("countif", (e: Seq[Expression]) => CountIf(e.head),
      "countIf(cond) - rows where cond = count_if"),
    ("sumif", (e: Seq[Expression]) => Sum(If(e(1), e(0), Literal(null))),
      "sumIf(x, cond) - sum of x over rows where cond"),
    ("avgif", (e: Seq[Expression]) => Average(If(e(1), e(0), Literal(null))),
      "avgIf(x, cond) - mean of x over rows where cond"),
    ("minif", (e: Seq[Expression]) => Min(If(e(1), e(0), Literal(null))),
      "minIf(x, cond) - min of x over rows where cond"),
    ("maxif", (e: Seq[Expression]) => Max(If(e(1), e(0), Literal(null))),
      "maxIf(x, cond) - max of x over rows where cond"),
    ("uniqexact", (e: Seq[Expression]) =>
      Count(e.head).toAggregateExpression(isDistinct = true),
      "uniqExact(x) - exact distinct count = count(DISTINCT x)"),
    // rsd 0.02 (not Spark's 0.05 default): ClickHouse uniq's documented
    // envelope is ~2%; the tighter sketch is ~4 KiB/group vs 1 — the right
    // trade for the analytics shapes this dialect serves
    ("uniq", (e: Seq[Expression]) =>
      new HyperLogLogPlusPlus(e.head, Literal(0.02d)),
      "uniq(x) - approximate distinct count (HLL++, ~2% rel. error)"),
    // ---- -State combinators (AggregatingMergeTree matview storage) ----
    // Deterministic, oracle-able state encodings (NOT CH's binary
    // states): uniqExactState = the sorted distinct-value array (CH's
    // uniqExact state IS the value set), avgState = (sum, count) struct,
    // sum/count/min/max states are their own partials. ChDdl merges
    // these column-wise at matview read (SURVEY §16.3).
    ("uniqexactstate", (e: Seq[Expression]) =>
      SortArray(CollectSet(e.head).toAggregateExpression(), Literal(true)),
      "uniqExactState(x) - mergeable exact-distinct state (sorted value set)"),
    ("sumstate", (e: Seq[Expression]) => Sum(e.head),
      "sumState(x) - mergeable sum partial"),
    ("countstate", (e: Seq[Expression]) =>
      Count(if (e.isEmpty) Seq(Literal(1)) else e),
      "countState([x]) - mergeable count partial"),
    ("minstate", (e: Seq[Expression]) => Min(e.head),
      "minState(x) - mergeable min partial"),
    ("maxstate", (e: Seq[Expression]) => Max(e.head),
      "maxState(x) - mergeable max partial"),
    ("avgstate", (e: Seq[Expression]) =>
      CreateNamedStruct(Seq(
        Literal("s"), Sum(e.head).toAggregateExpression(),
        Literal("c"), Count(e.head).toAggregateExpression())),
      "avgState(x) - mergeable mean state (sum, count struct)"),
    // quantileExactState(x, q): state = the sorted value MULTISET plus the
    // level (CH's quantileExact state is also the full value array — the
    // O(rows-per-key) cost is CH's own). Merge = multiset union
    // (flatten + sort); finalize = type-1 inverse CDF (smallest v with
    // cum count >= q*n, = DuckDB quantile_disc — CH's nearest-rank rule
    // differs by at most one rank; documented divergence for exactness).
    ("quantileexactstate", (e: Seq[Expression]) =>
      CreateNamedStruct(Seq(
        Literal("vs"), SortArray(CollectList(e(0)).toAggregateExpression(),
          Literal(true)),
        Literal("q"), Literal(Registry.constDouble(e(1), "quantileExactState")))),
      "quantileExactState(x, q) - mergeable exact-quantile state (sorted multiset + level)"),
    // topKState(x, k): state = the exact value->count pair array sorted by
    // value plus k. CH's topK state is a bounded space-saving sketch; the
    // exact pair table is the dialect's documented exactness-for-size
    // trade (same as the exact topK aggregate, q163). Merge = sum counts
    // per value; finalize = k most frequent, count desc then value asc.
    ("topkstate", (e: Seq[Expression]) =>
      CreateNamedStruct(Seq(
        Literal("vs"), org.apache.spark.sql.graft.CountPairs(e(0))
          .toAggregateExpression(),
        Literal("k"), Literal(Registry.constInt(e(1), "topKState").toLong))),
      "topKState(x, k) - mergeable exact top-k state (value->count pairs + k)"),
    ("any", (e: Seq[Expression]) => First(e.head, ignoreNulls = true),
      "any(x) - ClickHouse first-encountered value (non-deterministic order)"),
    ("anylast", (e: Seq[Expression]) => Last(e.head, ignoreNulls = true),
      "anyLast(x) - ClickHouse last-encountered value (non-deterministic order)"),
    // ClickHouse spells these parametrically — quantileExact(0.5)(x);
    // Spark's parser has no parametric-agg syntax, so the level rides as a
    // trailing argument: quantileExact(x, 0.5). Exact interpolated
    // percentile (Spark `percentile`), matching DuckDB quantile_cont.
    // Behavioral aggregates as SQL functions (ClickHouse parametric-call
    // shape windowFunnel(w)(ts, ...) cannot parse; parameters lead the
    // argument list). Windows / (?t) constraints in SECONDS.
    ("windowfunnel", (e: Seq[Expression]) =>
      org.apache.spark.sql.graft.WindowFunnelAgg(e),
      "windowFunnel(window_s, ts, cond1, ...) - max funnel level per group"),
    ("sequencematch", (e: Seq[Expression]) =>
      org.apache.spark.sql.graft.SequenceMatchAgg(e),
      "sequenceMatch('pattern', ts, cond1, ...) - (?N) .* (?t OP s) pattern match"),
    ("sequencecount", (e: Seq[Expression]) =>
      org.apache.spark.sql.graft.SequenceCountAgg(e),
      "sequenceCount('(?1).*(?2)...', ts, cond1, ...) - non-overlapping chain count"),
    ("retention", (e: Seq[Expression]) =>
      org.apache.spark.sql.graft.RetentionAgg(e),
      "retention(cond1, ...) - [r1, r1 AND cond2 seen, ...] flags"),
    ("summap", (e: Seq[Expression]) => SumMap(e(0), e(1)),
      "sumMap(keys, values) - per-key sums as (sorted keys, sums) struct"),
    ("minmap", (e: Seq[Expression]) =>
      SumMap(e(0), e(1), op = org.apache.spark.sql.graft.SumMap.OpMin),
      "minMap(keys, values) - per-key minimums (sorted keys)"),
    ("maxmap", (e: Seq[Expression]) =>
      SumMap(e(0), e(1), op = org.apache.spark.sql.graft.SumMap.OpMax),
      "maxMap(keys, values) - per-key maximums (sorted keys)"),
    ("grouparraymovingsum", (e: Seq[Expression]) =>
      org.apache.spark.sql.graft.MovingAgg.build(e,
        org.apache.spark.sql.graft.MovingAgg.ModeSum),
      "groupArrayMovingSum(sortKey, v[, win]) - moving sums in sortKey order"),
    ("grouparraymovingavg", (e: Seq[Expression]) =>
      org.apache.spark.sql.graft.MovingAgg.build(e,
        org.apache.spark.sql.graft.MovingAgg.ModeAvg),
      "groupArrayMovingAvg(sortKey, v[, win]) - moving means in sortKey order"),
    ("deltasum", (e: Seq[Expression]) =>
      org.apache.spark.sql.graft.MovingAgg.build(e.take(2),
        org.apache.spark.sql.graft.MovingAgg.ModeDeltaSum),
      "deltaSum(sortKey, v) - sum of positive steps in sortKey order"),
    // Sketch-family aliases: CH exposes several cardinality sketches;
    // all map onto the same HLL++ estimate here (uniq's 2% envelope).
    ("uniqcombined", (e: Seq[Expression]) =>
      new HyperLogLogPlusPlus(e.head, Literal(0.02d)),
      "uniqCombined(x) - approximate distinct (HLL++, alias of uniq)"),
    ("uniqtheta", (e: Seq[Expression]) =>
      new HyperLogLogPlusPlus(e.head, Literal(0.02d)),
      "uniqTheta(x) - approximate distinct (HLL++, alias of uniq)"),
    ("uniqhll12", (e: Seq[Expression]) =>
      new HyperLogLogPlusPlus(e.head, Literal(0.02d)),
      "uniqHLL12(x) - approximate distinct (HLL++, alias of uniq)"),
    // Bit / stats aggregate aliases onto Spark's codegen'd natives.
    ("groupbitand", (e: Seq[Expression]) => BitAndAgg(e.head),
      "groupBitAnd(x) = bit_and"),
    ("groupbitor", (e: Seq[Expression]) => BitOrAgg(e.head),
      "groupBitOr(x) = bit_or"),
    ("groupbitxor", (e: Seq[Expression]) => BitXorAgg(e.head),
      "groupBitXor(x) = bit_xor"),
    ("varpop", (e: Seq[Expression]) => VariancePop(e.head),
      "varPop(x) = var_pop"),
    ("varsamp", (e: Seq[Expression]) => VarianceSamp(e.head),
      "varSamp(x) = var_samp"),
    ("stddevpop", (e: Seq[Expression]) => StddevPop(e.head),
      "stddevPop(x) = stddev_pop"),
    ("stddevsamp", (e: Seq[Expression]) => StddevSamp(e.head),
      "stddevSamp(x) = stddev_samp"),
    ("covarpop", (e: Seq[Expression]) => CovPopulation(e(0), e(1)),
      "covarPop(x, y) = covar_pop"),
    ("covarsamp", (e: Seq[Expression]) => CovSample(e(0), e(1)),
      "covarSamp(x, y) = covar_samp"),
    ("topk", (e: Seq[Expression]) => org.apache.spark.sql.graft.TopK(e(0), e(1)),
      "topK(x, k) - k most frequent values, count desc then value asc (exact)"),
    ("topkweighted", (e: Seq[Expression]) =>
      org.apache.spark.sql.graft.TopK(e(0), e(1), e(2)),
      "topKWeighted(x, w, k) - k largest weight-sums, desc then value asc (exact)"),
    ("uniqupto", (e: Seq[Expression]) =>
      org.apache.spark.sql.graft.UniqUpTo(e(0), e(1)),
      "uniqUpTo(x, n) - exact distinct count saturated at n+1; O(n) state"),
    // --- roaring bitmap family (ClickHouse groupBitmap / bitmap*) ------
    // Exact set algebra over uint32 ids: the audience-segmentation /
    // retention workhorse. State is O(distinct ids), never O(rows).
    ("groupbitmap", (e: Seq[Expression]) =>
      org.apache.spark.sql.graft.GroupBitmapAgg(e.head, returnState = false),
      "groupBitmap(x) - exact distinct count via roaring bitmap"),
    ("groupbitmapstate", (e: Seq[Expression]) =>
      org.apache.spark.sql.graft.GroupBitmapAgg(e.head, returnState = true),
      "groupBitmapState(x) - serialized roaring bitmap of the group's values"),
    ("groupbitmapand", (e: Seq[Expression]) =>
      org.apache.spark.sql.graft.BitmapMergeAgg(e.head,
        org.apache.spark.sql.graft.BitmapMergeAgg.OpAnd, returnState = false),
      "groupBitmapAnd(bm) - cardinality of the intersection of bitmap states"),
    ("groupbitmapor", (e: Seq[Expression]) =>
      org.apache.spark.sql.graft.BitmapMergeAgg(e.head,
        org.apache.spark.sql.graft.BitmapMergeAgg.OpOr, returnState = false),
      "groupBitmapOr(bm) - cardinality of the union of bitmap states"),
    ("groupbitmapxor", (e: Seq[Expression]) =>
      org.apache.spark.sql.graft.BitmapMergeAgg(e.head,
        org.apache.spark.sql.graft.BitmapMergeAgg.OpXor, returnState = false),
      "groupBitmapXor(bm) - cardinality of the symmetric difference"),
    ("groupbitmapandstate", (e: Seq[Expression]) =>
      org.apache.spark.sql.graft.BitmapMergeAgg(e.head,
        org.apache.spark.sql.graft.BitmapMergeAgg.OpAnd, returnState = true),
      "groupBitmapAndState(bm) - intersection of bitmap states as a bitmap"),
    ("groupbitmaporstate", (e: Seq[Expression]) =>
      org.apache.spark.sql.graft.BitmapMergeAgg(e.head,
        org.apache.spark.sql.graft.BitmapMergeAgg.OpOr, returnState = true),
      "groupBitmapOrState(bm) - union of bitmap states as a bitmap"),
    ("groupbitmapxorstate", (e: Seq[Expression]) =>
      org.apache.spark.sql.graft.BitmapMergeAgg(e.head,
        org.apache.spark.sql.graft.BitmapMergeAgg.OpXor, returnState = true),
      "groupBitmapXorState(bm) - symmetric difference as a bitmap"),
    ("bitmapbuild", (e: Seq[Expression]) =>
      org.apache.spark.sql.graft.BitmapBuild(e.head),
      "bitmapBuild(array<bigint>) - serialized roaring bitmap"),
    ("bitmaptoarray", (e: Seq[Expression]) =>
      org.apache.spark.sql.graft.BitmapToArray(e.head),
      "bitmapToArray(bm) - ascending array<bigint> of members"),
    ("bitmapcardinality", (e: Seq[Expression]) =>
      org.apache.spark.sql.graft.BitmapUnaryLong(e.head, "cardinality"),
      "bitmapCardinality(bm) - member count"),
    ("bitmapmin", (e: Seq[Expression]) =>
      org.apache.spark.sql.graft.BitmapUnaryLong(e.head, "min"),
      "bitmapMin(bm) - smallest member (2^32-1 on empty, as ClickHouse)"),
    ("bitmapmax", (e: Seq[Expression]) =>
      org.apache.spark.sql.graft.BitmapUnaryLong(e.head, "max"),
      "bitmapMax(bm) - largest member (0 on empty, as ClickHouse)"),
    ("bitmapand", (e: Seq[Expression]) =>
      org.apache.spark.sql.graft.BitmapBinOp(e(0), e(1), "and"),
      "bitmapAnd(a, b) - intersection bitmap"),
    ("bitmapor", (e: Seq[Expression]) =>
      org.apache.spark.sql.graft.BitmapBinOp(e(0), e(1), "or"),
      "bitmapOr(a, b) - union bitmap"),
    ("bitmapxor", (e: Seq[Expression]) =>
      org.apache.spark.sql.graft.BitmapBinOp(e(0), e(1), "xor"),
      "bitmapXor(a, b) - symmetric-difference bitmap"),
    ("bitmapandnot", (e: Seq[Expression]) =>
      org.apache.spark.sql.graft.BitmapBinOp(e(0), e(1), "andnot"),
      "bitmapAndnot(a, b) - a minus b"),
    ("bitmapandcardinality", (e: Seq[Expression]) =>
      org.apache.spark.sql.graft.BitmapBinCard(e(0), e(1), "and"),
      "bitmapAndCardinality(a, b) - |a ∩ b| without building the result"),
    ("bitmaporcardinality", (e: Seq[Expression]) =>
      org.apache.spark.sql.graft.BitmapBinCard(e(0), e(1), "or"),
      "bitmapOrCardinality(a, b) - |a ∪ b| by inclusion-exclusion"),
    ("bitmapxorcardinality", (e: Seq[Expression]) =>
      org.apache.spark.sql.graft.BitmapBinCard(e(0), e(1), "xor"),
      "bitmapXorCardinality(a, b) - |a △ b|"),
    ("bitmapandnotcardinality", (e: Seq[Expression]) =>
      org.apache.spark.sql.graft.BitmapBinCard(e(0), e(1), "andnot"),
      "bitmapAndnotCardinality(a, b) - |a \\ b|"),
    ("bitmapcontains", (e: Seq[Expression]) =>
      org.apache.spark.sql.graft.BitmapContains(e(0), e(1)),
      "bitmapContains(bm, v) - membership probe"),
    ("bitmaphasall", (e: Seq[Expression]) =>
      org.apache.spark.sql.graft.BitmapHas(e(0), e(1), all = true),
      "bitmapHasAll(a, b) - true iff b ⊆ a"),
    ("bitmaphasany", (e: Seq[Expression]) =>
      org.apache.spark.sql.graft.BitmapHas(e(0), e(1), all = false),
      "bitmapHasAny(a, b) - true iff a ∩ b non-empty"),
    ("subbitmap", (e: Seq[Expression]) =>
      org.apache.spark.sql.graft.SubBitmap(e(0), e(1), e(2)),
      "subBitmap(bm, offset, limit) - ascending slice as a bitmap"),
    // quantile/quantiles/median: ClickHouse's default quantile is
    // APPROXIMATE (reservoir); mapped onto Spark's approx_percentile
    // (GK sketch, accuracy 10000). Spec-gated, not oracle-gated — two
    // different sketches agree only within tolerance.
    ("quantile", (e: Seq[Expression]) =>
      new ApproximatePercentile(e(0), e(1)),
      "quantile(x, level) - approximate percentile (sketch)"),
    ("quantiles", (e: Seq[Expression]) =>
      new ApproximatePercentile(e(0), CreateArray(e.drop(1))),
      "quantiles(x, l1, l2, ...) - approximate percentiles as array"),
    ("median", (e: Seq[Expression]) =>
      new ApproximatePercentile(e.head, Literal(0.5d)),
      "median(x) - approximate median = quantile(x, 0.5)"),
    ("quantileexact", (e: Seq[Expression]) => new Percentile(e(0), e(1)),
      "quantileExact(x, level) - exact interpolated percentile"),
    ("quantiletdigest", (e: Seq[Expression]) =>
      org.apache.spark.sql.graft.TDigestAgg(e(0), e(1)),
      "quantileTDigest(x, level) - t-digest percentile (bounded O(δ) state)"),
    ("quantilestdigest", (e: Seq[Expression]) =>
      org.apache.spark.sql.graft.TDigestAgg(e(0), CreateArray(e.drop(1))),
      "quantilesTDigest(x, l1, l2, ...) - t-digest percentiles as array"),
    ("mediantdigest", (e: Seq[Expression]) =>
      org.apache.spark.sql.graft.TDigestAgg(e.head, Literal(0.5d)),
      "medianTDigest(x) = quantileTDigest(x, 0.5)"),
    ("entropy", (e: Seq[Expression]) =>
      org.apache.spark.sql.graft.EntropyAgg(e.head),
      "entropy(x) - Shannon entropy (bits) of the value distribution; " +
        "summed in sorted-key order so the double is partitioning-exact"),
    // --- statistical moments (ClickHouse naming onto Spark's stable
    // central-moment kernels; CH's *Samp forms are plain mu_k/sigma_samp^k,
    // i.e. the population value scaled by ((n-1)/n)^(k/2)) ---------------
    ("skewpop", (e: Seq[Expression]) => Skewness(e.head),
      "skewPop(x) - population skewness m3/m2^1.5"),
    ("skewsamp", (e: Seq[Expression]) => {
      val n = Cast(Count(e.head).toAggregateExpression(), org.apache.spark.sql.types.DoubleType)
      Multiply(Skewness(e.head).toAggregateExpression(),
        Pow(Divide(Subtract(n, Literal(1.0d)), n), Literal(1.5d)))
    }, "skewSamp(x) = skewPop(x) * ((n-1)/n)^1.5 (CH mu3/sigma_samp^3)"),
    ("kurtpop", (e: Seq[Expression]) =>
      Add(Kurtosis(e.head).toAggregateExpression(), Literal(3.0d)),
      "kurtPop(x) - population kurtosis m4/m2^2 (NOT excess)"),
    ("kurtsamp", (e: Seq[Expression]) => {
      val n = Cast(Count(e.head).toAggregateExpression(), org.apache.spark.sql.types.DoubleType)
      Multiply(Add(Kurtosis(e.head).toAggregateExpression(), Literal(3.0d)),
        Pow(Divide(Subtract(n, Literal(1.0d)), n), Literal(2.0d)))
    }, "kurtSamp(x) = kurtPop(x) * ((n-1)/n)^2 (CH mu4/sigma_samp^4)"),
    ("simplelinearregression", (e: Seq[Expression]) =>
      CreateNamedStruct(Seq(
        Literal("k"), RegrSlope(e(1), e(0)).toAggregateExpression(),
        Literal("b"), RegrIntercept(e(1), e(0)).toAggregateExpression())),
      "simpleLinearRegression(x, y) - struct(k, b) fitting y = k*x + b " +
        "(Spark regr_slope/regr_intercept kernels)"),
    // --- hypothesis tests + categorical association ---------------------
    ("studentttest", (e: Seq[Expression]) =>
      org.apache.spark.sql.graft.TTestAgg(e(0), e(1), welch = false),
      "studentTTest(v, sample01) - struct(t_stat, p_value), pooled variance"),
    ("welchttest", (e: Seq[Expression]) =>
      org.apache.spark.sql.graft.TTestAgg(e(0), e(1), welch = true),
      "welchTTest(v, sample01) - struct(t_stat, p_value), Welch-Satterthwaite df"),
    ("cramersv", (e: Seq[Expression]) =>
      org.apache.spark.sql.graft.PairStatsAgg(e(0), e(1), "cramers_v"),
      "cramersV(x, y) - Cramer's V association in [0, 1]"),
    ("cramersvbiascorrected", (e: Seq[Expression]) =>
      org.apache.spark.sql.graft.PairStatsAgg(e(0), e(1), "cramers_v_bias_corrected"),
      "cramersVBiasCorrected(x, y) - Bergsma-corrected Cramer's V"),
    ("theilsu", (e: Seq[Expression]) =>
      org.apache.spark.sql.graft.PairStatsAgg(e(0), e(1), "theils_u"),
      "theilsU(x, y) - uncertainty coefficient U(x|y) in [0, 1]"),
    ("contingency", (e: Seq[Expression]) =>
      org.apache.spark.sql.graft.PairStatsAgg(e(0), e(1), "contingency"),
      "contingency(x, y) - Pearson contingency coefficient sqrt(chi2/(chi2+n))"),
    // --- presentation / parsing helpers ---------------------------------
    ("formatreadablesize", (e: Seq[Expression]) =>
      org.apache.spark.sql.graft.FormatReadableSize(e.head),
      "formatReadableSize(x) - '120.56 KiB' style IEC units"),
    ("formatreadablequantity", (e: Seq[Expression]) =>
      org.apache.spark.sql.graft.FormatReadableQuantity(e.head),
      "formatReadableQuantity(x) - '1.23 million' style"),
    ("bar", (e: Seq[Expression]) =>
      org.apache.spark.sql.graft.BarExpr(e(0), e(1), e(2),
        if (e.length > 3) e(3) else Literal(80.0d)),
      "bar(x, min, max[, width=80]) - block gauge with eighth partials"),
    ("extractkeyvaluepairs", (e: Seq[Expression]) =>
      org.apache.spark.sql.graft.ExtractKeyValuePairs(e.head),
      "extractKeyValuePairs(s) - map<string,string>, ':' kv and ',;/space' " +
        "pair delimiters; last duplicate key wins"),
    // --- encoding / bit / IP dialect (CH everyday idioms) ----------------
    // NB these SHADOW Spark's builtin hex/unhex: CH hex(int) pads to whole
    // bytes ('01') and CH unhex returns a String, which is the dialect the
    // reference teaches its LLM (docs/vector-sql.md).
    ("hex", (e: Seq[Expression]) => org.apache.spark.sql.graft.ChHex(e.head),
      "hex(x) - uppercase hex; ints big-endian with leading zero BYTES skipped"),
    ("unhex", (e: Seq[Expression]) => org.apache.spark.sql.graft.ChUnhex(e.head),
      "unhex(s) - hex digits to string bytes; odd length implies leading 0 nibble"),
    ("base64encode", (e: Seq[Expression]) =>
      org.apache.spark.sql.graft.Base64Encode(e.head),
      "base64Encode(s) - RFC 4648 base64 of the UTF-8 bytes"),
    ("base64decode", (e: Seq[Expression]) =>
      org.apache.spark.sql.graft.Base64Decode(e.head),
      "base64Decode(s) - decode, throws on invalid input"),
    ("trybase64decode", (e: Seq[Expression]) =>
      org.apache.spark.sql.graft.TryBase64Decode(e.head),
      "tryBase64Decode(s) - decode, '' on invalid input"),
    ("bitshiftleft", (e: Seq[Expression]) =>
      org.apache.spark.sql.graft.BitShiftLeft(e(0), e(1)),
      "bitShiftLeft(a, b) - a << b; 0 when b outside [0, 64)"),
    ("bitshiftright", (e: Seq[Expression]) =>
      org.apache.spark.sql.graft.BitShiftRight(e(0), e(1)),
      "bitShiftRight(a, b) - arithmetic a >> b; 0 when b outside [0, 64)"),
    ("ipv4numtostring", (e: Seq[Expression]) =>
      org.apache.spark.sql.graft.Ipv4NumToString(e.head),
      "IPv4NumToString(n) - dotted quad of the low 32 bits"),
    ("ipv4stringtonum", (e: Seq[Expression]) =>
      org.apache.spark.sql.graft.Ipv4StringToNum(e.head),
      "IPv4StringToNum(s) - UInt32 of a dotted quad; throws on malformed"),
    ("isipv4string", (e: Seq[Expression]) =>
      org.apache.spark.sql.graft.IsIpv4String(e.head),
      "isIPv4String(s) - true iff s parses as a dotted-quad IPv4 address"),
    ("alphatokens", (e: Seq[Expression]) => {
      val x = UnresolvedNamedLambdaVariable(Seq("x"))
      ArrayFilter(
        StringSplit(e.head, Literal("[^a-zA-Z]+"), Literal(-1)),
        LambdaFunction(Not(EqualTo(x, Literal(""))), Seq(x)))
    }, "alphaTokens(s) - maximal runs of a-zA-Z"),
    ("ngrams", (e: Seq[Expression]) => {
      val i = UnresolvedNamedLambdaVariable(Seq("i"))
      val n = e(1)
      // guard: sequence(1, 0, 1) raises, so short strings return [] directly
      If(LessThan(Length(e.head), n),
        Literal.create(Array.empty[String],
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.StringType)),
        ArrayTransform(
          Sequence(Literal(1),
            Add(Subtract(Length(e.head), n), Literal(1)),
            Some(Literal(1))),
          LambdaFunction(Substring(e.head, i, n), Seq(i))))
    }, "ngrams(s, n) - character n-grams in order (empty when len < n)"),
    // --- weighted/approx quantiles, weighted mean, matrix stats ---------
    ("avgweighted", (e: Seq[Expression]) => {
      val num = Cast(Sum(Multiply(Cast(e(0), org.apache.spark.sql.types.DoubleType),
        Cast(e(1), org.apache.spark.sql.types.DoubleType))).toAggregateExpression(),
        org.apache.spark.sql.types.DoubleType)
      val den = Cast(Sum(Cast(e(1), org.apache.spark.sql.types.DoubleType))
        .toAggregateExpression(), org.apache.spark.sql.types.DoubleType)
      // explicit NaN branch: ANSI mode raises on the 0/0 CH returns NaN for
      If(EqualTo(den, Literal(0.0d)), Literal(Double.NaN), Divide(num, den))
    }, "avgWeighted(v, w) = sum(v*w)/sum(w); NaN when total weight is 0"),
    ("sumcount", (e: Seq[Expression]) =>
      CreateNamedStruct(Seq(
        Literal("sum"), Sum(e.head).toAggregateExpression(),
        Literal("count"), Count(e.head).toAggregateExpression())),
      "sumCount(x) - struct(sum, count) in one pass"),
    ("sumwithoverflow", (e: Seq[Expression]) => Sum(e.head),
      "sumWithOverflow(x) = sum (Spark's non-ANSI long sum wraps, CH-like)"),
    ("quantileexactweighted", (e: Seq[Expression]) =>
      org.apache.spark.sql.graft.WeightedQuantileAgg(e(0), e(1), e(2) match {
        case Literal(v, _: org.apache.spark.sql.types.NumericType) => v match {
          case d: org.apache.spark.sql.types.Decimal => d.toDouble
          case n: Number => n.doubleValue()
        }
        case other => throw new IllegalArgumentException(
          "quantileExactWeighted level must be a numeric literal, got: " + other)
      }),
      "quantileExactWeighted(v, w, q) - smallest v with cum weight >= q*total"),
    ("medianexactweighted", (e: Seq[Expression]) =>
      org.apache.spark.sql.graft.WeightedQuantileAgg(e(0), e(1), 0.5),
      "medianExactWeighted(v, w) = quantileExactWeighted(v, w, 0.5)"),
    ("quantilegk", (e: Seq[Expression]) =>
      new ApproximatePercentile(e(0), e(1),
        if (e.length > 2) e(2) else Literal(10000)),
      "quantileGK(x, q[, accuracy]) - Greenwald-Khanna sketch " +
        "(Spark approx_percentile kernel; rank error <= 1/accuracy)"),
    ("quantiletiming", (e: Seq[Expression]) => new Percentile(e(0), e(1)),
      "quantileTiming(x, q) - served by the EXACT percentile (CH's is a " +
        "bucketed approximation; exact is strictly more accurate)"),
    ("arrayauc", (e: Seq[Expression]) =>
      org.apache.spark.sql.graft.ArrayAuc(e(0), e(1)),
      "arrayAUC(scores, labels) - ROC AUC with average-rank ties; NaN if " +
        "one class is empty"),
    ("laginframe", (e: Seq[Expression]) =>
      Lag(e(0), if (e.length > 1) e(1) else Literal(1),
        if (e.length > 2) e(2) else Literal(null), ignoreNulls = false),
      "lagInFrame(x[, n[, default]]) = lag (CH window-frame spelling)"),
    ("leadinframe", (e: Seq[Expression]) =>
      Lead(e(0), if (e.length > 1) e(1) else Literal(1),
        if (e.length > 2) e(2) else Literal(null), ignoreNulls = false),
      "leadInFrame(x[, n[, default]]) = lead (CH window-frame spelling)"),
    ("corrmatrix", (e: Seq[Expression]) =>
      org.apache.spark.sql.graft.MomentMatrixAgg(e, "corr"),
      "corrMatrix(c1, ..., cN) - NxN Pearson matrix as array<array<double>>"),
    ("covarsampmatrix", (e: Seq[Expression]) =>
      org.apache.spark.sql.graft.MomentMatrixAgg(e, "covar_samp"),
      "covarSampMatrix(c1, ..., cN) - NxN sample covariance matrix"),
    ("covarpopmatrix", (e: Seq[Expression]) =>
      org.apache.spark.sql.graft.MomentMatrixAgg(e, "covar_pop"),
      "covarPopMatrix(c1, ..., cN) - NxN population covariance matrix"),
    // --- fuzzy string matching (dedup/curation dialect) -----------------
    ("editdistance", (e: Seq[Expression]) => Levenshtein(e(0), e(1)),
      "editDistance(a, b) = levenshtein"),
    ("levenshteindistance", (e: Seq[Expression]) => Levenshtein(e(0), e(1)),
      "levenshteinDistance(a, b) = levenshtein"),
    ("dameraulevenshteindistance", (e: Seq[Expression]) =>
      org.apache.spark.sql.graft.DamerauLevenshtein(e(0), e(1)),
      "damerauLevenshteinDistance(a, b) - TRUE DL (transpositions), not OSA"),
    ("jarosimilarity", (e: Seq[Expression]) =>
      org.apache.spark.sql.graft.JaroSimilarity(e(0), e(1)),
      "jaroSimilarity(a, b) in [0,1]; either side empty -> 0"),
    ("jarowinklersimilarity", (e: Seq[Expression]) =>
      org.apache.spark.sql.graft.JaroWinklerSimilarity(e(0), e(1)),
      "jaroWinklerSimilarity(a, b) - p=0.1, prefix<=4, boost above 0.7 only"),
    ("stringjaccardindex", (e: Seq[Expression]) =>
      org.apache.spark.sql.graft.StringJaccardIndex(e(0), e(1)),
      "stringJaccardIndex(a, b) - Jaccard over character sets"),
    ("ngramdistance", (e: Seq[Expression]) =>
      org.apache.spark.sql.graft.NgramDistance(e(0), e(1)),
      "ngramDistance(a, b) - Sorensen-Dice distance over 4-gram multisets"),
    ("meanztest", (e: Seq[Expression]) => {
      def litD(x: Expression, what: String): Double = x match {
        case Literal(v, _: org.apache.spark.sql.types.NumericType) => v match {
          case d: org.apache.spark.sql.types.Decimal => d.toDouble
          case n: Number => n.doubleValue()
        }
        case other => throw new IllegalArgumentException(
          s"meanZTest $what must be a numeric literal, got: " + other)
      }
      org.apache.spark.sql.graft.ZTestAgg(e(0), e(1),
        litD(e(2), "varX"), litD(e(3), "varY"))
    }, "meanZTest(v, sample01, varX, varY) - struct(z_stat, p_value) with " +
      "known population variances"),
    ("rankcorr", (e: Seq[Expression]) =>
      org.apache.spark.sql.graft.RankStatsAgg(e(0), e(1), "rank_corr"),
      "rankCorr(x, y) - Spearman rank correlation, average-rank ties"),
    ("kolmogorovsmirnovtest", (e: Seq[Expression]) =>
      org.apache.spark.sql.graft.RankStatsAgg(e(0), e(1), "ks_test"),
      "kolmogorovSmirnovTest(v, sample01) - struct(d_statistic, p_value)"),
    ("mannwhitneyutest", (e: Seq[Expression]) =>
      org.apache.spark.sql.graft.RankStatsAgg(e(0), e(1), "mwu_test"),
      "mannWhitneyUTest(v, sample01) - struct(u_statistic, p_value), " +
        "U of sample 0, tie-corrected normal approximation"),
    // --- interval sweep aggregates --------------------------------------
    ("maxintersections", (e: Seq[Expression]) =>
      org.apache.spark.sql.graft.IntervalAgg(e(0), e(1), "max_intersections"),
      "maxIntersections(start, end) - max concurrent intervals (end exclusive)"),
    ("maxintersectionsposition", (e: Seq[Expression]) =>
      org.apache.spark.sql.graft.IntervalAgg(e(0), e(1), "max_intersections_position"),
      "maxIntersectionsPosition(start, end) - leftmost point reaching the max"),
    ("intervallengthsum", (e: Seq[Expression]) =>
      org.apache.spark.sql.graft.IntervalAgg(e(0), e(1), "interval_length_sum"),
      "intervalLengthSum(start, end) - total length of the interval union"),
    ("modeexact", (e: Seq[Expression]) =>
      org.apache.spark.sql.graft.ModeAgg(e.head),
      "modeExact(x) - most frequent value, ties to the smallest (deterministic)"),
    ("anyheavy", (e: Seq[Expression]) =>
      org.apache.spark.sql.graft.ModeAgg(e.head),
      "anyHeavy(x) - CH heavy hitter; graft serves the exact deterministic mode"),
    ("boundingratio", (e: Seq[Expression]) =>
      Divide(
        Subtract(MaxBy(e(1), e(0)).toAggregateExpression(),
          MinBy(e(1), e(0)).toAggregateExpression()),
        Cast(Subtract(Max(e(0)).toAggregateExpression(),
          Min(e(0)).toAggregateExpression()),
          org.apache.spark.sql.types.DoubleType)),
      "boundingRatio(x, y) - (y at max x - y at min x)/(max x - min x); " +
        "deterministic when x is unique within the group (documented contract)"),
    // --- time-series aggregates (explicit-sort-key contract) ------------
    ("exponentialmovingaverage", (e: Seq[Expression]) =>
      org.apache.spark.sql.graft.EmaAgg(e(0), e(1), e(2) match {
        case Literal(v, _: org.apache.spark.sql.types.NumericType) => v match {
          case d: org.apache.spark.sql.types.Decimal => d.toDouble
          case n: Number => n.doubleValue()
        }
        case other => throw new IllegalArgumentException(
          "exponentialMovingAverage half-life must be a numeric literal, got: " + other)
      }),
      "exponentialMovingAverage(sortKey, v, halfLife) - EWMA at the latest key"),
    ("sparkbar", (e: Seq[Expression]) => {
      def litL(x: Expression, what: String): Long = x match {
        case Literal(v, org.apache.spark.sql.types.IntegerType |
                         org.apache.spark.sql.types.LongType |
                         org.apache.spark.sql.types.ShortType) =>
          v.asInstanceOf[Number].longValue()
        case other => throw new IllegalArgumentException(
          s"sparkbar $what must be an integer literal, got: " + other)
      }
      // loud failure on 4 args: sparkbar(x, y, w, minX) would otherwise
      // silently drop minX and fall back to data-derived bounds
      if (e.length != 3 && e.length != 5) throw new IllegalArgumentException(
        s"sparkbar takes (x, y, width) or (x, y, width, minX, maxX); got ${e.length} args")
      org.apache.spark.sql.graft.SparkbarAgg(e(0), e(1),
        litL(e(2), "width").toInt,
        if (e.length == 5) Some((litL(e(3), "minX"), litL(e(4), "maxX"))) else None)
    }, "sparkbar(x, y, width[, minX, maxX]) - 8-level block sparkline of " +
      "per-bucket y sums; zero/empty buckets render as spaces"),
    ("largesttrianglethreebuckets", (e: Seq[Expression]) =>
      org.apache.spark.sql.graft.LttbAgg(e(0), e(1), e(2) match {
        case Literal(v, org.apache.spark.sql.types.IntegerType) => v.asInstanceOf[Int]
        case Literal(v, org.apache.spark.sql.types.LongType) => v.asInstanceOf[Long].toInt
        case other => throw new IllegalArgumentException(
          "largestTriangleThreeBuckets bucket count must be an integer literal, got: " + other)
      }),
      "largestTriangleThreeBuckets(x, y, n) - LTTB downsample to n points " +
        "(Steinarsson 2013), array<struct(x, y)> in x order"),
    ("lttb", (e: Seq[Expression]) =>
      org.apache.spark.sql.graft.LttbAgg(e(0), e(1), e(2) match {
        case Literal(v, org.apache.spark.sql.types.IntegerType) => v.asInstanceOf[Int]
        case Literal(v, org.apache.spark.sql.types.LongType) => v.asInstanceOf[Long].toInt
        case other => throw new IllegalArgumentException(
          "lttb bucket count must be an integer literal, got: " + other)
      }),
      "lttb(x, y, n) = largestTriangleThreeBuckets"),
    // --- the -ForEach combinator family (position-wise array aggs) ------
    ("sumforeach", (e: Seq[Expression]) =>
      org.apache.spark.sql.graft.ForEachAgg(e.head, "sum"),
      "sumForEach(arr) - position-wise sums; ragged tails contribute nothing"),
    ("minforeach", (e: Seq[Expression]) =>
      org.apache.spark.sql.graft.ForEachAgg(e.head, "min"),
      "minForEach(arr) - position-wise minima"),
    ("maxforeach", (e: Seq[Expression]) =>
      org.apache.spark.sql.graft.ForEachAgg(e.head, "max"),
      "maxForEach(arr) - position-wise maxima"),
    ("avgforeach", (e: Seq[Expression]) =>
      org.apache.spark.sql.graft.ForEachAgg(e.head, "avg"),
      "avgForEach(arr) - position-wise means over present elements"),
    ("countforeach", (e: Seq[Expression]) =>
      org.apache.spark.sql.graft.ForEachAgg(e.head, "count"),
      "countForEach(arr) - position-wise non-null element counts"),
    // --- geo family -----------------------------------------------------
    ("greatcircledistance", (e: Seq[Expression]) =>
      org.apache.spark.sql.graft.GreatCircleDistance(e(0), e(1), e(2), e(3)),
      "greatCircleDistance(lon1, lat1, lon2, lat2) - haversine meters on " +
        "the IUGG mean sphere"),
    // ClickHouse geoDistance corrects for the WGS-84 ellipsoid; this alias
    // stays spherical (divergence < 0.5% of distance, documented).
    ("geodistance", (e: Seq[Expression]) =>
      org.apache.spark.sql.graft.GreatCircleDistance(e(0), e(1), e(2), e(3)),
      "geoDistance(lon1, lat1, lon2, lat2) - alias of greatCircleDistance"),
    ("pointinpolygon", (e: Seq[Expression]) =>
      org.apache.spark.sql.graft.PointInPolygon(e(0), e(1), e(2), e(3)),
      "pointInPolygon(x, y, xs, ys) - ray casting; boundary counts inside"),
    ("geohashencode", (e: Seq[Expression]) =>
      org.apache.spark.sql.graft.GeohashEncode(e(0), e(1),
        if (e.length > 2) e(2) else Literal(12)),
      "geohashEncode(lon, lat[, precision=12]) - base32 geohash"),
    ("geohashdecode", (e: Seq[Expression]) =>
      org.apache.spark.sql.graft.GeohashDecode(e.head),
      "geohashDecode(s) - struct(longitude, latitude) of the cell center"),
    ("medianexact", (e: Seq[Expression]) => new Percentile(e.head, Literal(0.5d)),
      "medianExact(x) - exact median = quantileExact(x, 0.5)"),
    // --- ClickHouse date/time dialect ----------------------------------
    // (prompts.py:39 `today()` is already above; these are the family the
    // reference's LLM prompt teaches alongside it — ClickHouse
    // "Functions for working with dates and times".)
    ("tostartofday", (e: Seq[Expression]) =>
      TruncTimestamp(Literal("day"), e.head),
      "toStartOfDay(ts) = date_trunc('day', ts)"),
    ("tostartofhour", (e: Seq[Expression]) =>
      TruncTimestamp(Literal("hour"), e.head),
      "toStartOfHour(ts) = date_trunc('hour', ts)"),
    ("tostartofminute", (e: Seq[Expression]) =>
      TruncTimestamp(Literal("minute"), e.head),
      "toStartOfMinute(ts) = date_trunc('minute', ts)"),
    ("tostartofmonth", (e: Seq[Expression]) =>
      TruncTimestamp(Literal("month"), e.head),
      "toStartOfMonth(ts) = date_trunc('month', ts)"),
    ("toyyyymm", (e: Seq[Expression]) =>
      Add(Multiply(Year(e.head), Literal(100)), Month(e.head)),
      "toYYYYMM(ts) - year*100 + month as int (202401)"),
    ("todate", (e: Seq[Expression]) =>
      Cast(e.head, org.apache.spark.sql.types.DateType),
      "toDate(ts) - calendar date of a timestamp"),
    ("tohour", (e: Seq[Expression]) => Hour(e.head), "toHour(ts) 0-23"),
    ("tominute", (e: Seq[Expression]) => Minute(e.head), "toMinute(ts) 0-59"),
    ("toyear", (e: Seq[Expression]) => Year(e.head), "toYear(ts)"),
    ("tomonth", (e: Seq[Expression]) => Month(e.head), "toMonth(ts) 1-12"),
    ("todayofmonth", (e: Seq[Expression]) => DayOfMonth(e.head),
      "toDayOfMonth(ts) 1-31"),
    // ClickHouse default mode: Monday = 1 … Sunday = 7 (ISO); Spark's
    // dayofweek is Sunday = 1, hence the modular shift.
    ("todayofweek", (e: Seq[Expression]) =>
      Add(Pmod(Add(DayOfWeek(e.head), Literal(5)), Literal(7)), Literal(1)),
      "toDayOfWeek(ts) - ISO weekday, Monday=1 .. Sunday=7"),
    ("tounixtimestamp", (e: Seq[Expression]) =>
      Cast(e.head, org.apache.spark.sql.types.LongType),
      "toUnixTimestamp(ts) - epoch seconds (floor)"),
    ("adddays", (e: Seq[Expression]) => new TimestampAdd("DAY", e(1), e(0)),
      "addDays(ts, n)"),
    ("addhours", (e: Seq[Expression]) => new TimestampAdd("HOUR", e(1), e(0)),
      "addHours(ts, n)"),
    ("subtractdays", (e: Seq[Expression]) =>
      new TimestampAdd("DAY", UnaryMinus(e(1)), e(0)),
      "subtractDays(ts, n)"),
    // NB: ClickHouse `dateDiff('unit', a, b)` (quoted unit, boundary-
    // crossing count) CANNOT be registered here — Spark's parser owns the
    // datediff/date_diff/timestampdiff names and rejects a quoted unit
    // before ever consulting the function registry. The dialect mapping is
    // the trunc identity, exercised by q157:
    //   dateDiff('u', a, b) == timestampdiff(u, date_trunc('u', a),
    //                                           date_trunc('u', b))
    // (ClickHouse and DuckDB both count unit boundaries crossed; Spark's
    // native timestampdiff counts complete elapsed units.)
    ("subtracthours", (e: Seq[Expression]) =>
      new TimestampAdd("HOUR", UnaryMinus(e(1)), e(0)),
      "subtractHours(ts, n)"),
    ("addminutes", (e: Seq[Expression]) => new TimestampAdd("MINUTE", e(1), e(0)),
      "addMinutes(ts, n)"),
    ("subtractminutes", (e: Seq[Expression]) =>
      new TimestampAdd("MINUTE", UnaryMinus(e(1)), e(0)),
      "subtractMinutes(ts, n)"),
    ("addseconds", (e: Seq[Expression]) => new TimestampAdd("SECOND", e(1), e(0)),
      "addSeconds(ts, n)"),
    ("subtractseconds", (e: Seq[Expression]) =>
      new TimestampAdd("SECOND", UnaryMinus(e(1)), e(0)),
      "subtractSeconds(ts, n)"),
    ("addmonths", (e: Seq[Expression]) => new TimestampAdd("MONTH", e(1), e(0)),
      "addMonths(ts, n)"),
    ("subtractmonths", (e: Seq[Expression]) =>
      new TimestampAdd("MONTH", UnaryMinus(e(1)), e(0)),
      "subtractMonths(ts, n)"),
    ("toquarter", (e: Seq[Expression]) => Quarter(e.head),
      "toQuarter(ts) - 1..4"),
    ("tostartofquarter", (e: Seq[Expression]) =>
      TruncTimestamp(Literal("quarter"), e.head),
      "toStartOfQuarter(ts) = date_trunc('quarter', ts)"),
    ("tostartofyear", (e: Seq[Expression]) =>
      TruncTimestamp(Literal("year"), e.head),
      "toStartOfYear(ts) = date_trunc('year', ts)"),
    // CH toMonday/toStartOfWeek(mode 0): Monday- vs Sunday-anchored week
    // starts, both as DATE (the CH return type). date_trunc('week') is
    // Monday-anchored in Spark and DuckDB alike; the Sunday anchor is the
    // Monday anchor of ts+1day, minus one day.
    ("tomonday", (e: Seq[Expression]) =>
      Cast(TruncTimestamp(Literal("week"), e.head),
        org.apache.spark.sql.types.DateType),
      "toMonday(ts) - DATE of the Monday-anchored week start"),
    ("tostartofweek", (e: Seq[Expression]) =>
      DateSub(Cast(TruncTimestamp(Literal("week"),
          new TimestampAdd("DAY", Literal(1), e.head)),
        org.apache.spark.sql.types.DateType), Literal(1)),
      "toStartOfWeek(ts) - DATE of the Sunday-anchored week start (mode 0)"),
    ("toisoweek", (e: Seq[Expression]) => WeekOfYear(e.head),
      "toISOWeek(ts) - ISO-8601 week number = weekofyear"),
    ("todayofyear", (e: Seq[Expression]) => DayOfYear(e.head),
      "toDayOfYear(ts) - 1..366"),
    ("tolastdayofmonth", (e: Seq[Expression]) => LastDay(e.head),
      "toLastDayOfMonth(ts) = last_day"),
    ("toyyyymmdd", (e: Seq[Expression]) =>
      Add(Multiply(Year(e.head), Literal(10000)),
        Add(Multiply(Month(e.head), Literal(100)), DayOfMonth(e.head))),
      "toYYYYMMDD(ts) - year*10000 + month*100 + day (20240115)"),
    ("yesterday", (_: Seq[Expression]) => DateSub(CurrentDate(), Literal(1)),
      "yesterday() = current_date - 1"),
    // Fixed-interval floors: epoch-second arithmetic, codegen'd. CH
    // timeSlot IS toStartOfInterval(ts, 30 min).
    ("tostartoffiveminutes", (e: Seq[Expression]) =>
      Registry.epochFloor(e.head, 300),
      "toStartOfFiveMinutes(ts)"),
    ("tostartoftenminutes", (e: Seq[Expression]) =>
      Registry.epochFloor(e.head, 600),
      "toStartOfTenMinutes(ts)"),
    ("tostartoffifteenminutes", (e: Seq[Expression]) =>
      Registry.epochFloor(e.head, 900),
      "toStartOfFifteenMinutes(ts)"),
    ("timeslot", (e: Seq[Expression]) => Registry.epochFloor(e.head, 1800),
      "timeSlot(ts) - floor to the half hour"),
    ("tostartofinterval", (e: Seq[Expression]) => e(1) match {
      case Literal(s, org.apache.spark.sql.types.IntegerType) =>
        Registry.epochFloor(e(0), s.asInstanceOf[Int].toLong)
      case Literal(s, org.apache.spark.sql.types.LongType) =>
        Registry.epochFloor(e(0), s.asInstanceOf[Long])
      case other => throw new IllegalArgumentException(
        s"toStartOfInterval(ts, seconds): literal second count required, got $other")
    }, "toStartOfInterval(ts, seconds) - floor ts to a fixed second grid"),
    // --- ClickHouse dictionaries (broadcast point-lookup enrichment) ----
    // Dict/attr names must be string literals: the dictionary is resolved
    // at ANALYSIS time into a broadcast-backed expression (Dict.scala).
    ("dictget", (e: Seq[Expression]) =>
      org.apache.spark.sql.graft.DictCatalog.buildGet(e, mode = 0),
      "dictGet('dict', 'attr', key) - broadcast lookup; type default on miss"),
    ("dictgetordefault", (e: Seq[Expression]) =>
      org.apache.spark.sql.graft.DictCatalog.buildGet(e, mode = 2),
      "dictGetOrDefault('dict', 'attr', key, default)"),
    ("dictgetornull", (e: Seq[Expression]) =>
      org.apache.spark.sql.graft.DictCatalog.buildGet(e, mode = 1),
      "dictGetOrNull('dict', 'attr', key) - NULL on miss"),
    ("dicthas", (e: Seq[Expression]) =>
      org.apache.spark.sql.graft.DictCatalog.buildHas(e),
      "dictHas('dict', key)"),
    // --- ClickHouse formatDateTime (%-syntax → Java pattern) -----------
    // Supported subset (the unambiguous CH/MySQL symbols; %i is MINUTE
    // in both): %Y %y %m %d %H %i %S %j %F %T %%. Constant format only —
    // translated once at analysis time onto Spark's codegen'd
    // date_format. Literal runs are single-quote-escaped for the Java
    // pattern syntax.
    ("formatdatetime", (e: Seq[Expression]) => DateFormatClass(e(0),
      Literal(Registry.chFormatToJava(
        Registry.constString(e(1), "formatDateTime")))),
      "formatDateTime(ts, '%Y-%m-%d %H:%i:%S') - CH %-syntax formatting"),
    // --- ClickHouse token search ---------------------------------------
    // hasToken: needle must appear bounded by non-alphanumerics (the
    // tokenbf index probe semantics). CH requires a CONSTANT needle;
    // mirrored here — the regex is precompiled at analysis time.
    ("hastoken", (e: Seq[Expression]) => RLike(e(0), Literal(
      "(^|[^A-Za-z0-9])" +
        java.util.regex.Pattern.quote(Registry.constString(e(1), "hasToken")) +
        "([^A-Za-z0-9]|$)")),
      "hasToken(haystack, 'needle') - whole-token match"),
    ("hastokencaseinsensitive", (e: Seq[Expression]) => RLike(Lower(e(0)),
      Literal("(^|[^a-z0-9])" +
        java.util.regex.Pattern.quote(
          Registry.constString(e(1), "hasTokenCaseInsensitive").toLowerCase) +
        "([^a-z0-9]|$)")),
      "hasTokenCaseInsensitive(haystack, 'needle')"),
    ("multisearchallpositions", (e: Seq[Expression]) => {
      val n = UnresolvedNamedLambdaVariable(Seq("n"))
      ArrayTransform(e(1), LambdaFunction(new StringLocate(n, e(0)), Seq(n)))
    }, "multiSearchAllPositions(haystack, [needles]) - 1-based, 0 if absent"),
    // CH tokens(): alphanumeric runs, empties dropped
    ("tokens", (e: Seq[Expression]) => {
      val t = UnresolvedNamedLambdaVariable(Seq("t"))
      ArrayFilter(
        StringSplit(e.head, Literal("[^A-Za-z0-9]+"), Literal(-1)),
        LambdaFunction(GreaterThan(Length(t), Literal(0)), Seq(t)))
    }, "tokens(s) - alphanumeric tokens"),
    // --- ClickHouse arrayJoin: the row-multiplying function ------------
    // Maps to Spark's Explode generator; the analyzer's ExtractGenerator
    // lifts it out of the SELECT list into a Generate node, which is the
    // plan shape ClickHouse's ARRAY JOIN clause produces too.
    ("arrayjoin", (e: Seq[Expression]) => Explode(e.head),
      "arrayJoin(arr) - one output row per array element"),

    // =====================================================================
    // Round-11 dialect closure — the FnGap audit's gap list worked from
    // data (SURVEY §16). Static kernels live in MiscOps / VectorNormOps /
    // Ipv6Ops / ReadableOps and register via StaticInvoke (codegen'd
    // static calls, null-propagating); the rest are compositions over
    // Spark's codegen'd builtins.
    // =====================================================================
    // --- arithmetic ------------------------------------------------------
    ("gcd", (e: Seq[Expression]) => Registry.si(LongType, "gcd",
      Seq(Cast(e(0), LongType), Cast(e(1), LongType))),
      "gcd(a, b) - greatest common divisor (non-negative)"),
    ("lcm", (e: Seq[Expression]) => Registry.si(LongType, "lcm",
      Seq(Cast(e(0), LongType), Cast(e(1), LongType))),
      "lcm(a, b) - least common multiple; overflow fails loudly"),
    ("max2", (e: Seq[Expression]) => Greatest(e.take(2)), "max2(a, b) = greatest"),
    ("min2", (e: Seq[Expression]) => Least(e.take(2)), "min2(a, b) = least"),
    // --- math ------------------------------------------------------------
    ("exp2", (e: Seq[Expression]) => Pow(Literal(2.0d), e.head), "exp2(x) = 2^x"),
    ("exp10", (e: Seq[Expression]) => Pow(Literal(10.0d), e.head), "exp10(x) = 10^x"),
    ("intexp2", (e: Seq[Expression]) =>
      org.apache.spark.sql.graft.BitShiftLeft(Literal(1L), Cast(e.head, LongType)),
      "intExp2(x) - exact 2^x as Int64 (0 past the width)"),
    ("intexp10", (e: Seq[Expression]) => Registry.si(LongType, "intExp10",
      Seq(Cast(e.head, IntegerType))),
      "intExp10(x) - exact 10^x as Int64, x in [0, 18]"),
    ("erf", (e: Seq[Expression]) => Registry.si(DoubleType, "erf",
      Seq(Cast(e.head, DoubleType))), "erf(x) - error function"),
    ("erfc", (e: Seq[Expression]) => StaticInvoke(
      org.apache.spark.sql.graft.SpecialMath.getClass, DoubleType, "erfc",
      Seq(Cast(e.head, DoubleType)), Seq(DoubleType), returnNullable = false),
      "erfc(x) - complementary error function"),
    ("lgamma", (e: Seq[Expression]) => StaticInvoke(
      org.apache.spark.sql.graft.SpecialMath.getClass, DoubleType, "lnGamma",
      Seq(Cast(e.head, DoubleType)), Seq(DoubleType), returnNullable = false),
      "lgamma(x) = ln Gamma(x)"),
    ("tgamma", (e: Seq[Expression]) => Registry.si(DoubleType, "tgamma",
      Seq(Cast(e.head, DoubleType))), "tgamma(x) = Gamma(x)"),
    // --- rounding ---------------------------------------------------------
    ("roundbankers", (e: Seq[Expression]) =>
      BRound(e(0), if (e.length > 1) e(1) else Literal(0)),
      "roundBankers(x[, n]) - HALF_EVEN rounding = bround"),
    ("truncate", (e: Seq[Expression]) => Registry.si(DoubleType, "truncate",
      Seq(Cast(e(0), DoubleType),
        if (e.length > 1) Cast(e(1), IntegerType) else Literal(0))),
      "truncate(x[, n]) - toward-zero truncation at n decimals"),
    ("roundtoexp2", (e: Seq[Expression]) => Registry.si(LongType, "roundToExp2",
      Seq(Cast(e.head, LongType))),
      "roundToExp2(x) - largest power of two <= x (0 when x < 1)"),
    ("roundduration", (e: Seq[Expression]) => Registry.si(LongType, "roundDuration",
      Seq(Cast(e.head, LongType))),
      "roundDuration(x) - CH session-length ladder"),
    ("roundage", (e: Seq[Expression]) => Registry.si(LongType, "roundAge",
      Seq(Cast(e.head, LongType))),
      "roundAge(x) - CH age-bucket ladder"),
    ("rounddown", (e: Seq[Expression]) => Registry.si(DoubleType, "roundDown",
      Seq(Cast(e(0), DoubleType), Cast(e(1), ArrayType(DoubleType)))),
      "roundDown(x, [bounds]) - largest bound <= x, else the smallest bound"),
    // --- type conversion ---------------------------------------------------
    // CH integer casts WRAP (two's complement / modular); ANSI Cast would
    // throw, so the signed forms use legacy eval mode and the unsigned
    // forms are explicit pmod arithmetic.
    ("toint8", (e: Seq[Expression]) =>
      Cast(e.head, ByteType, None, EvalMode.LEGACY), "toInt8(x) - wrapping cast"),
    ("toint16", (e: Seq[Expression]) =>
      Cast(e.head, ShortType, None, EvalMode.LEGACY), "toInt16(x) - wrapping cast"),
    ("touint8", (e: Seq[Expression]) =>
      Cast(Pmod(Cast(e.head, LongType), Literal(256L)), IntegerType),
      "toUInt8(x) - value mod 2^8"),
    ("touint16", (e: Seq[Expression]) =>
      Cast(Pmod(Cast(e.head, LongType), Literal(65536L)), IntegerType),
      "toUInt16(x) - value mod 2^16"),
    ("touint32", (e: Seq[Expression]) =>
      Pmod(Cast(e.head, LongType), Literal(4294967296L)),
      "toUInt32(x) - value mod 2^32"),
    ("todatetime", (e: Seq[Expression]) => Cast(e.head, TimestampType),
      "toDateTime(x) = cast timestamp"),
    ("todecimal32", (e: Seq[Expression]) =>
      Cast(e(0), DecimalType(9, Registry.constInt(e(1), "toDecimal32"))),
      "toDecimal32(x, s) = cast decimal(9, s)"),
    ("todecimal64", (e: Seq[Expression]) =>
      Cast(e(0), DecimalType(18, Registry.constInt(e(1), "toDecimal64"))),
      "toDecimal64(x, s) = cast decimal(18, s)"),
    ("tointervalsecond", (e: Seq[Expression]) => MakeDTInterval(Literal(0),
      Literal(0), Literal(0), Cast(e.head, DecimalType(18, 6))),
      "toIntervalSecond(n)"),
    ("tointervalminute", (e: Seq[Expression]) => MakeDTInterval(Literal(0),
      Literal(0), Cast(e.head, IntegerType), Literal(Decimal(0, 18, 6), DecimalType(18, 6))),
      "toIntervalMinute(n)"),
    ("tointervalhour", (e: Seq[Expression]) => MakeDTInterval(Literal(0),
      Cast(e.head, IntegerType), Literal(0), Literal(Decimal(0, 18, 6), DecimalType(18, 6))),
      "toIntervalHour(n)"),
    ("tointervalday", (e: Seq[Expression]) => MakeDTInterval(
      Cast(e.head, IntegerType), Literal(0), Literal(0),
      Literal(Decimal(0, 18, 6), DecimalType(18, 6))), "toIntervalDay(n)"),
    ("tointervalweek", (e: Seq[Expression]) => MakeDTInterval(
      Cast(Multiply(Cast(e.head, LongType), Literal(7L)), IntegerType),
      Literal(0), Literal(0), Literal(Decimal(0, 18, 6), DecimalType(18, 6))),
      "toIntervalWeek(n) = n*7 days"),
    ("tointervalmonth", (e: Seq[Expression]) =>
      MakeYMInterval(Literal(0), Cast(e.head, IntegerType)), "toIntervalMonth(n)"),
    ("tointervalyear", (e: Seq[Expression]) =>
      MakeYMInterval(Cast(e.head, IntegerType), Literal(0)), "toIntervalYear(n)"),
    // --- dates -------------------------------------------------------------
    ("tosecond", (e: Seq[Expression]) => Second(e.head), "toSecond(ts)"),
    ("datetrunc", (e: Seq[Expression]) => TruncTimestamp(e(0), e(1)),
      "dateTrunc('unit', ts) = date_trunc"),
    ("addyears", (e: Seq[Expression]) => new TimestampAdd("YEAR", e(1), e(0)),
      "addYears(ts, n)"),
    ("addweeks", (e: Seq[Expression]) => new TimestampAdd("WEEK", e(1), e(0)),
      "addWeeks(ts, n)"),
    ("subtractyears", (e: Seq[Expression]) =>
      new TimestampAdd("YEAR", UnaryMinus(e(1)), e(0)), "subtractYears(ts, n)"),
    ("datesub", (e: Seq[Expression]) => new TimestampAdd(
      Registry.constString(e(0), "dateSub").toUpperCase, UnaryMinus(e(1)), e(2)),
      "dateSub('unit', n, ts) - subtract n units"),
    ("fromunixtimestamp", (e: Seq[Expression]) => SecondsToTimestamp(e.head),
      "fromUnixTimestamp(n) - epoch seconds to timestamp"),
    ("torelativedaynum", (e: Seq[Expression]) =>
      DateDiff(Cast(e.head, DateType), Literal(0, DateType)),
      "toRelativeDayNum(ts) - days since 1970-01-01"),
    // --- strings -----------------------------------------------------------
    ("concatwithseparator", (e: Seq[Expression]) => ConcatWs(e),
      "concatWithSeparator(sep, s1, ...) = concat_ws"),
    ("substringutf8", (e: Seq[Expression]) => Substring(e(0), e(1), e(2)),
      "substringUTF8(s, pos, len) = substring (code points)"),
    ("appendtrailingcharifabsent", (e: Seq[Expression]) =>
      Registry.si(StringType, "appendTrailingCharIfAbsent", e.take(2)),
      "appendTrailingCharIfAbsent(s, c)"),
    ("splitbyregexp", (e: Seq[Expression]) =>
      StringSplit(e(1), e(0), Literal(-1)),
      "splitByRegexp(re, s) - CH arg order (pattern first)"),
    ("replaceregexpone", (e: Seq[Expression]) =>
      Registry.si(StringType, "replaceRegexpOne", e.take(3)),
      "replaceRegexpOne(s, re, to) - first match; \\1 backrefs"),
    ("multisearchfirstposition", (e: Seq[Expression]) =>
      Registry.si(IntegerType, "multiSearchFirstPosition", e.take(2)),
      "multiSearchFirstPosition(s, [needles]) - smallest 1-based hit, 0 if none"),
    ("multisearchfirstindex", (e: Seq[Expression]) =>
      Registry.si(IntegerType, "multiSearchFirstIndex", e.take(2)),
      "multiSearchFirstIndex(s, [needles]) - 1-based needle index, 0 if none"),
    // --- arrays ------------------------------------------------------------
    ("arraypopback", (e: Seq[Expression]) =>
      Slice(e.head, Literal(1), Greatest(Seq(Subtract(Size(e.head), Literal(1)),
        Literal(0)))), "arrayPopBack(arr)"),
    ("arraypopfront", (e: Seq[Expression]) =>
      Slice(e.head, Literal(2), Greatest(Seq(Subtract(Size(e.head), Literal(1)),
        Literal(0)))), "arrayPopFront(arr)"),
    ("arrayresize", (e: Seq[Expression]) => {
      require(e.length == 3,
        "arrayResize(arr, n, filler): graft requires the explicit filler " +
          "(CH's type-default filler would be a silent guess here)")
      If(LessThanOrEqual(e(1), Size(e(0))),
        Slice(e(0), Literal(1), Greatest(Seq(e(1), Literal(0)))),
        Concat(Seq(e(0), ArrayRepeat(e(2), Subtract(e(1), Size(e(0)))))))
    }, "arrayResize(arr, n, filler) - truncate or pad to length n"),
    ("arrayproduct", (e: Seq[Expression]) => {
      val acc = UnresolvedNamedLambdaVariable(Seq("acc"))
      val x = UnresolvedNamedLambdaVariable(Seq("x"))
      val id = UnresolvedNamedLambdaVariable(Seq("acc"))
      ArrayAggregate(Cast(e.head, ArrayType(DoubleType)), Literal(1.0d),
        LambdaFunction(Multiply(acc, x), Seq(acc, x)),
        LambdaFunction(id, Seq(id)))
    }, "arrayProduct(arr) - product of elements as double"),
    ("arrayzip", (e: Seq[Expression]) => new ArraysZip(e),
      "arrayZip(a, b, ...) = arrays_zip"),
    ("arrayrotateleft", (e: Seq[Expression]) => {
      val k = Pmod(e(1), Size(e(0)))
      If(LessThanOrEqual(Size(e(0)), Literal(0)), e(0),
        Concat(Seq(Slice(e(0), Add(k, Literal(1)), Subtract(Size(e(0)), k)),
          Slice(e(0), Literal(1), k))))
    }, "arrayRotateLeft(arr, n)"),
    ("arrayrotateright", (e: Seq[Expression]) => {
      val k = Pmod(UnaryMinus(e(1)), Size(e(0)))
      If(LessThanOrEqual(Size(e(0)), Literal(0)), e(0),
        Concat(Seq(Slice(e(0), Add(k, Literal(1)), Subtract(Size(e(0)), k)),
          Slice(e(0), Literal(1), k))))
    }, "arrayRotateRight(arr, n)"),
    ("emptyarrayuint64", (_: Seq[Expression]) =>
      Literal.create(Array.empty[Long], ArrayType(LongType)),
      "emptyArrayUInt64() - []"),
    ("hassubstr", (e: Seq[Expression]) =>
      org.apache.spark.sql.graft.HasSubstr(e(0), e(1)),
      "hasSubstr(a, b) - b is a contiguous subsequence of a"),
    ("arrayenumerateuniq", (e: Seq[Expression]) =>
      org.apache.spark.sql.graft.ArrayEnumerateUniq(e.head),
      "arrayEnumerateUniq(arr) - 1-based occurrence index per element"),
    // --- maps ---------------------------------------------------------------
    ("mapkeys", (e: Seq[Expression]) => MapKeys(e.head), "mapKeys(m) = map_keys"),
    ("mapvalues", (e: Seq[Expression]) => MapValues(e.head),
      "mapValues(m) = map_values"),
    ("mapcontains", (e: Seq[Expression]) => MapContainsKey(e(0), e(1)),
      "mapContains(m, k) = map_contains_key"),
    ("mapfromarrays", (e: Seq[Expression]) => MapFromArrays(e(0), e(1)),
      "mapFromArrays(keys, values)"),
    ("mapfilter", (e: Seq[Expression]) => MapFilter(e(0), e(1)),
      "mapFilter(m, (k, v) -> cond) = map_filter"),
    ("mapadd", (e: Seq[Expression]) => {
      val k = UnresolvedNamedLambdaVariable(Seq("k"))
      val a = UnresolvedNamedLambdaVariable(Seq("a"))
      val b = UnresolvedNamedLambdaVariable(Seq("b"))
      MapZipWith(e(0), e(1), LambdaFunction(
        Add(Coalesce(Seq(a, Literal(0))), Coalesce(Seq(b, Literal(0)))),
        Seq(k, a, b)))
    }, "mapAdd(m1, m2) - key union, values summed (missing = 0)"),
    ("mapsubtract", (e: Seq[Expression]) => {
      val k = UnresolvedNamedLambdaVariable(Seq("k"))
      val a = UnresolvedNamedLambdaVariable(Seq("a"))
      val b = UnresolvedNamedLambdaVariable(Seq("b"))
      MapZipWith(e(0), e(1), LambdaFunction(
        Subtract(Coalesce(Seq(a, Literal(0))), Coalesce(Seq(b, Literal(0)))),
        Seq(k, a, b)))
    }, "mapSubtract(m1, m2) - key union, values subtracted"),
    ("mapupdate", (e: Seq[Expression]) => {
      val k = UnresolvedNamedLambdaVariable(Seq("k"))
      val a = UnresolvedNamedLambdaVariable(Seq("a"))
      val b = UnresolvedNamedLambdaVariable(Seq("b"))
      MapZipWith(e(0), e(1), LambdaFunction(Coalesce(Seq(b, a)), Seq(k, a, b)))
    }, "mapUpdate(m1, m2) - key union, m2 wins on conflicts"),
    // --- json / url ----------------------------------------------------------
    ("simplejsonextractstring", (e: Seq[Expression]) =>
      GetJsonObject(e(0), Concat(Seq(Literal("$."), e(1)))),
      "simpleJSONExtractString = JSONExtractString"),
    ("isvalidjson", (e: Seq[Expression]) =>
      Registry.si(BooleanType, "isValidJson", e.take(1)),
      "isValidJSON(s) - strict whole-string JSON parse"),
    ("querystringandfragment", (e: Seq[Expression]) =>
      RegExpExtract(e.head, Literal("\\?(.*)$"), Literal(1)),
      "queryStringAndFragment(url) - everything after '?'"),
    ("cutwww", (e: Seq[Expression]) =>
      RegExpReplace(e.head, Literal("^((?:[a-zA-Z][a-zA-Z0-9+.-]*:)?//)www\\."),
        Literal("$1")), "cutWWW(url) - drop a leading www. from the host"),
    ("netloc", (e: Seq[Expression]) =>
      RegExpExtract(e.head,
        Literal("^(?:[a-zA-Z][a-zA-Z0-9+.-]*:)?//([^/?#]*)"), Literal(1)),
      "netloc(url) - user:pass@host:port"),
    ("decodeurlcomponent", (e: Seq[Expression]) =>
      Registry.siu(StringType, "decodeUrlComponent", e.take(1)),
      "decodeURLComponent(s) - percent-decoding (UTF-8)"),
    ("encodeurlcomponent", (e: Seq[Expression]) =>
      Registry.siu(StringType, "encodeUrlComponent", e.take(1)),
      "encodeURLComponent(s) - percent-encoding (RFC 3986 unreserved kept)"),
    ("extracturlparameters", (e: Seq[Expression]) =>
      RegExpExtractAll(e.head, Literal("[?&]([^=&#]+=[^&#]*)"), Literal(1)),
      "extractURLParameters(url) - ['k=v', ...]"),
    ("extracturlparameternames", (e: Seq[Expression]) =>
      RegExpExtractAll(e.head, Literal("[?&]([^=&#]+)="), Literal(1)),
      "extractURLParameterNames(url) - ['k', ...]"),
    ("urlhierarchy", (e: Seq[Expression]) =>
      Registry.siu(ArrayType(StringType), "urlHierarchy", e.take(1)),
      "URLHierarchy(url) - progressive path/query prefixes"),
    ("urlpathhierarchy", (e: Seq[Expression]) =>
      Registry.siu(ArrayType(StringType), "urlPathHierarchy", e.take(1)),
      "URLPathHierarchy(url) - progressive path prefixes (no protocol/host)"),
    ("firstsignificantsubdomain", (e: Seq[Expression]) =>
      Registry.siu(StringType, "firstSignificantSubdomain",
        Seq(Registry.urlDomain(e.head))),
      "firstSignificantSubdomain(url) - label before the public suffix " +
        "(common-suffix heuristic: com/net/org/co/gov/edu/ac + ccTLD)"),
    ("cuttofirstsignificantsubdomain", (e: Seq[Expression]) =>
      Registry.siu(StringType, "cutToFirstSignificantSubdomain",
        Seq(Registry.urlDomain(e.head))),
      "cutToFirstSignificantSubdomain(url) - that label + the suffix"),
    // --- IP ----------------------------------------------------------------
    ("ipv4stringtonumornull", (e: Seq[Expression]) =>
      If(org.apache.spark.sql.graft.IsIpv4String(e.head),
        org.apache.spark.sql.graft.Ipv4StringToNum(e.head),
        Literal(null, LongType)),
      "IPv4StringToNumOrNull(s) - NULL on malformed"),
    ("isipv6string", (e: Seq[Expression]) =>
      Registry.si6(BooleanType, "isIpv6String", e.take(1)),
      "isIPv6String(s)"),
    ("ipv6stringtonum", (e: Seq[Expression]) =>
      Registry.si6(BinaryType, "ipv6StringToNum", e.take(1)),
      "IPv6StringToNum(s) - 16 bytes; throws on malformed"),
    ("ipv6numtostring", (e: Seq[Expression]) =>
      Registry.si6(StringType, "ipv6NumToString", e.take(1)),
      "IPv6NumToString(b) - RFC 5952 canonical text"),
    ("ipv4toipv6", (e: Seq[Expression]) =>
      Registry.si6(BinaryType, "ipv4ToIpv6", Seq(Cast(e.head, LongType))),
      "IPv4ToIPv6(n) - ::ffff:a.b.c.d mapped 16 bytes"),
    ("ipv4cidrtorange", (e: Seq[Expression]) => {
      val n = Cast(e(0), LongType)
      val p = Cast(e(1), IntegerType)
      CreateNamedStruct(Seq(
        Literal("lo"), org.apache.spark.sql.graft.Ipv4NumToString(
          Registry.si6(LongType, "ipv4CidrLo", Seq(n, p))),
        Literal("hi"), org.apache.spark.sql.graft.Ipv4NumToString(
          Registry.si6(LongType, "ipv4CidrHi", Seq(n, p)))))
    }, "IPv4CIDRToRange(n, prefix) - struct(lo, hi) dotted quads"),
    ("isipaddressinrange", (e: Seq[Expression]) =>
      Registry.si6(BooleanType, "isIpAddressInRange", e.take(2)),
      "isIPAddressInRange(addr, 'cidr') - v4 and v6 literals"),
    // --- bit ----------------------------------------------------------------
    ("bitand", (e: Seq[Expression]) => BitwiseAnd(e(0), e(1)), "bitAnd(a, b)"),
    ("bitor", (e: Seq[Expression]) => BitwiseOr(e(0), e(1)), "bitOr(a, b)"),
    ("bitxor", (e: Seq[Expression]) => BitwiseXor(e(0), e(1)), "bitXor(a, b)"),
    ("bitnot", (e: Seq[Expression]) => BitwiseNot(e.head), "bitNot(a)"),
    ("bitcount", (e: Seq[Expression]) => BitwiseCount(e.head),
      "bitCount(a) - set bits"),
    ("bithammingdistance", (e: Seq[Expression]) =>
      BitwiseCount(BitwiseXor(Cast(e(0), LongType), Cast(e(1), LongType))),
      "bitHammingDistance(a, b) = bitCount(a XOR b)"),
    ("bitrotateleft", (e: Seq[Expression]) => {
      val a = Cast(e(0), LongType); val b = Pmod(Cast(e(1), LongType), Literal(64L))
      BitwiseOr(ShiftLeft(a, Cast(b, IntegerType)),
        ShiftRightUnsigned(a, Cast(Pmod(Subtract(Literal(64L), b), Literal(64L)),
          IntegerType)))
    }, "bitRotateLeft(a, n) - 64-bit rotate"),
    ("bitrotateright", (e: Seq[Expression]) => {
      val a = Cast(e(0), LongType); val b = Pmod(Cast(e(1), LongType), Literal(64L))
      BitwiseOr(ShiftRightUnsigned(a, Cast(b, IntegerType)),
        ShiftLeft(a, Cast(Pmod(Subtract(Literal(64L), b), Literal(64L)),
          IntegerType)))
    }, "bitRotateRight(a, n) - 64-bit rotate"),
    ("bittest", (e: Seq[Expression]) =>
      Cast(BitwiseAnd(
        org.apache.spark.sql.graft.BitShiftRight(Cast(e(0), LongType),
          Cast(e(1), LongType)), Literal(1L)), IntegerType),
      "bitTest(a, i) - bit i of a as 0/1"),
    ("bittestall", (e: Seq[Expression]) => {
      val a = Cast(e(0), LongType)
      e.drop(1).map(i => EqualTo(BitwiseAnd(
          org.apache.spark.sql.graft.BitShiftRight(a, Cast(i, LongType)),
          Literal(1L)), Literal(1L)))
        .reduceLeft[Expression]((x, y) => And(x, y))
    }, "bitTestAll(a, i1, ...) - all listed bits set"),
    ("bittestany", (e: Seq[Expression]) => {
      val a = Cast(e(0), LongType)
      e.drop(1).map(i => EqualTo(BitwiseAnd(
          org.apache.spark.sql.graft.BitShiftRight(a, Cast(i, LongType)),
          Literal(1L)), Literal(1L)))
        .reduceLeft[Expression]((x, y) => Or(x, y))
    }, "bitTestAny(a, i1, ...) - any listed bit set"),
    // --- hash ---------------------------------------------------------------
    ("javahash", (e: Seq[Expression]) => Registry.si(IntegerType, "javaHash",
      e.take(1)), "javaHash(s) - Java String.hashCode, byte-exact"),
    ("halfmd5", (e: Seq[Expression]) => Registry.si(LongType, "halfMD5",
      e.take(1)), "halfMD5(s) - first 8 MD5 bytes big-endian, CH-exact"),
    ("sha224", (e: Seq[Expression]) => Registry.si(BinaryType, "sha224",
      e.take(1)), "SHA224(s) - 28 raw bytes (hex() to print)"),
    ("sha256", (e: Seq[Expression]) => Registry.si(BinaryType, "sha256",
      e.take(1)), "SHA256(s) - 32 raw bytes (hex() to print)"),
    ("hivehash", (e: Seq[Expression]) => HiveHash(e), "hiveHash(x...)"),
    // CH-exact bytes via lz4-java's canonical xxHash (seed 0 over the
    // UTF-8 string bytes); multi-arg falls back to Spark's xxhash64
    // (seed 42, Spark row encoding) which the Column API keeps anyway
    ("xxhash64", (e: Seq[Expression]) =>
      if (e.length == 1)
        org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke(
          org.apache.spark.sql.graft.Murmur3.getClass, LongType, "xxHash64ch",
          Seq(Cast(e.head, StringType)), returnNullable = false)
      else new XxHash64(e),
      "xxHash64(s) - canonical xxHash64, seed 0 over string bytes (CH " +
        "bytes; multi-arg = Spark's seed-42 row hash)"),
    ("xxhash32", (e: Seq[Expression]) =>
      org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke(
        org.apache.spark.sql.graft.Murmur3.getClass, LongType, "xxHash32",
        Seq(Cast(e.head, StringType)), returnNullable = false),
      "xxHash32(s) - canonical xxHash32, seed 0 over string bytes, as UInt32"),
    ("farmfingerprint64", (e: Seq[Expression]) =>
      org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke(
        org.apache.spark.sql.graft.Murmur3.getClass, LongType,
        "farmFingerprint64", Seq(Cast(e.head, StringType)),
        returnNullable = false),
      "farmFingerprint64(s) - canonical FarmHash Fingerprint64 (Guava " +
        "direct) over string bytes"),
    ("ngramsimhash", (e: Seq[Expression]) =>
      org.apache.spark.sql.graft.SimHash64(Registry.ngramsExpr(e.head, Literal(4))),
      "ngramSimHash(s) - simhash over 4-grams (graft bits, not CH's)"),
    ("wordshinglesimhash", (e: Seq[Expression]) => {
      val t = UnresolvedNamedLambdaVariable(Seq("t"))
      org.apache.spark.sql.graft.SimHash64(ArrayFilter(
        StringSplit(e.head, Literal("[^A-Za-z0-9]+"), Literal(-1)),
        LambdaFunction(GreaterThan(Length(t), Literal(0)), Seq(t))))
    }, "wordShingleSimHash(s) - simhash over word tokens (graft bits)"),
    // --- vector norms / distances -------------------------------------------
    ("l1distance", (e: Seq[Expression]) => Registry.vn(DoubleType, "l1Distance",
      e.take(2)), "L1Distance(a, b)"),
    ("l2squareddistance", (e: Seq[Expression]) => Registry.vn(DoubleType,
      "l2SquaredDistance", e.take(2)), "L2SquaredDistance(a, b)"),
    ("linfdistance", (e: Seq[Expression]) => Registry.vn(DoubleType,
      "linfDistance", e.take(2)), "LinfDistance(a, b)"),
    ("lpdistance", (e: Seq[Expression]) => Registry.vn(DoubleType, "lpDistance",
      e.take(2), Seq(Cast(e(2), DoubleType))),
      "LpDistance(a, b, p)"),
    ("cosinedistance", (e: Seq[Expression]) =>
      org.apache.spark.sql.graft.CosineDistance(e(0), e(1)),
      "cosineDistance(a, b) - CH spelling of cosine_distance"),
    ("l1norm", (e: Seq[Expression]) => Registry.vn(DoubleType, "l1Norm",
      e.take(1)), "L1Norm(a)"),
    ("l2norm", (e: Seq[Expression]) => Registry.vn(DoubleType, "l2Norm",
      e.take(1)), "L2Norm(a)"),
    ("l2squarednorm", (e: Seq[Expression]) => Registry.vn(DoubleType,
      "l2SquaredNorm", e.take(1)), "L2SquaredNorm(a)"),
    ("linfnorm", (e: Seq[Expression]) => Registry.vn(DoubleType, "linfNorm",
      e.take(1)), "LinfNorm(a)"),
    ("lpnorm", (e: Seq[Expression]) => Registry.vn(DoubleType, "lpNorm",
      e.take(1), Seq(Cast(e(1), DoubleType))), "LpNorm(a, p)"),
    ("normalizel1", (e: Seq[Expression]) => Registry.vn(
      ArrayType(FloatType, containsNull = false), "normalizeL1", e.take(1)),
      "normalizeL1(a) - a / L1Norm(a); zero vector unchanged"),
    ("normalizel2", (e: Seq[Expression]) => Registry.vn(
      ArrayType(FloatType, containsNull = false), "normalizeL2", e.take(1)),
      "normalizeL2(a) - a / L2Norm(a); zero vector unchanged"),
    // --- other ---------------------------------------------------------------
    ("basename", (e: Seq[Expression]) =>
      RegExpExtract(e.head, Literal("([^/\\\\]*)$"), Literal(1)),
      "basename(path) - text after the last / or \\"),
    ("totypename", (e: Seq[Expression]) =>
      org.apache.spark.sql.graft.ToTypeName(e.head),
      "toTypeName(x) - SQL type of the argument (constant-folded)"),
    ("materialize", (e: Seq[Expression]) => e.head,
      "materialize(x) = x (CH constant-folding hint; no-op here)"),
    ("identity", (e: Seq[Expression]) => e.head,
      "identity(x) = x (CH index-analysis bypass; no-op here)"),
    ("ignore", (e: Seq[Expression]) => Literal(0),
      "ignore(...) = 0 (CH side-effect sink)"),
    ("indexhint", (e: Seq[Expression]) => Literal(1),
      "indexHint(...) = 1 (CH index-only hint; graft prunes declaratively)"),
    ("currentdatabase", (_: Seq[Expression]) => CurrentDatabase(),
      "currentDatabase()"),
    ("isfinite", (e: Seq[Expression]) => {
      val x = Cast(e.head, DoubleType)
      And(Not(IsNaN(x)),
        Not(EqualTo(Abs(x), Literal(Double.PositiveInfinity))))
    }, "isFinite(x)"),
    ("isinfinite", (e: Seq[Expression]) =>
      EqualTo(Abs(Cast(e.head, DoubleType)), Literal(Double.PositiveInfinity)),
      "isInfinite(x)"),
    ("throwif", (e: Seq[Expression]) =>
      If(Cast(e.head, BooleanType),
        Cast(RaiseError(if (e.length > 1) e(1)
          else Literal("throwIf condition met")), BooleanType),
        Literal(false)),
      "throwIf(cond[, msg]) - fail the query when cond holds"),
    ("countdigits", (e: Seq[Expression]) => Registry.si(IntegerType,
      "countDigits", Seq(Cast(e.head, LongType))),
      "countDigits(x) - decimal digits of the integer part"),
    ("formatreadabledecimalsize", (e: Seq[Expression]) => StaticInvoke(
      org.apache.spark.sql.graft.ReadableOps.getClass, StringType,
      "formatReadableDecimalSize", Seq(Cast(e.head, DoubleType)),
      Seq(DoubleType), returnNullable = false),
      "formatReadableDecimalSize(x) - '120.56 MB' 1000-based units"),
    ("formatreadabletimedelta", (e: Seq[Expression]) => StaticInvoke(
      org.apache.spark.sql.graft.ReadableOps.getClass, StringType,
      "formatReadableTimeDelta", Seq(Cast(e.head, DoubleType)),
      Seq(DoubleType), returnNullable = false),
      "formatReadableTimeDelta(sec) - '2 days, 3 hours, 4 minutes, 5 seconds'"),
    // --- aggregates -----------------------------------------------------------
    ("quantilesexact", (e: Seq[Expression]) =>
      new Percentile(e(0), CreateArray(e.drop(1))),
      "quantilesExact(x, l1, l2, ...) - array of exact percentiles"),
    ("sumkahan", (e: Seq[Expression]) =>
      org.apache.spark.sql.graft.KahanSumAgg(Cast(e.head, DoubleType)),
      "sumKahan(x) - compensated double summation"),
    ("quantiletdigestweighted", (e: Seq[Expression]) =>
      org.apache.spark.sql.graft.TDigestWeightedAgg(e(0), e(1), e(2)),
      "quantileTDigestWeighted(x, w, level) - weighted t-digest percentile"),
    ("deltasumtimestamp", (e: Seq[Expression]) =>
      org.apache.spark.sql.graft.MovingAgg.build(Seq(e(1), e(0)),
        org.apache.spark.sql.graft.MovingAgg.ModeDeltaSum),
      "deltaSumTimestamp(v, ts) - deltaSum ordered by ts"),
    // --- bitmap subsets --------------------------------------------------------
    ("bitmapsubsetinrange", (e: Seq[Expression]) =>
      org.apache.spark.sql.graft.BitmapSubsetInRange(e(0), e(1), e(2)),
      "bitmapSubsetInRange(bm, lo, hi) - members in [lo, hi)"),
    ("bitmapsubsetlimit", (e: Seq[Expression]) =>
      org.apache.spark.sql.graft.BitmapSubsetLimit(e(0), e(1), e(2)),
      "bitmapSubsetLimit(bm, start, limit) - first `limit` members >= start"),

    // --- round-11 wave 2: real hash/encoding/tuple implementations --------
    // sipHash64 UPGRADED from the xxhash64 stand-in to true SipHash-2-4
    // with CH's zero key — byte-exact for one string argument (HashesSpec
    // pins the reference-paper keyed vectors); multi-arg combines per-arg
    // hashes pairwise (graft-stable, documented).
    ("siphash64", (e: Seq[Expression]) => {
      def one(x: Expression): Expression = Registry.sih(LongType, "sip64",
        Seq(Cast(x, StringType)))
      e.map(one).reduceLeft((a, b) =>
        Registry.sih(LongType, "sip64Combine", Seq(a, b)))
    }, "sipHash64(x...) - SipHash-2-4, zero key; CH-byte-exact for one string"),
    ("siphash128", (e: Seq[Expression]) =>
      Registry.sih(BinaryType, "sip128", Seq(Cast(e.head, StringType))),
      "sipHash128(s) - SipHash-2-4-128, zero key, 16 bytes"),
    ("ngramminhash", (e: Seq[Expression]) => {
      val grams = Registry.ngramsExpr(e.head, Literal(4))
      Registry.sih(StructType(Seq(StructField("min", LongType, nullable = false),
        StructField("max", LongType, nullable = false))), "minMaxHash", Seq(grams))
    }, "ngramMinHash(s) - struct(min, max) of 4-gram sip64 hashes (graft bits)"),
    ("wordshingleminhash", (e: Seq[Expression]) => {
      val t = UnresolvedNamedLambdaVariable(Seq("t"))
      val words = ArrayFilter(
        StringSplit(e.head, Literal("[^A-Za-z0-9]+"), Literal(-1)),
        LambdaFunction(GreaterThan(Length(t), Literal(0)), Seq(t)))
      Registry.sih(StructType(Seq(StructField("min", LongType, nullable = false),
        StructField("max", LongType, nullable = false))), "minMaxHash", Seq(words))
    }, "wordShingleMinHash(s) - struct(min, max) of word sip64 hashes (graft bits)"),
    ("base58encode", (e: Seq[Expression]) =>
      Registry.sie2(StringType, "base58Encode", e.take(1)),
      "base58Encode(s) - Bitcoin-alphabet base58"),
    ("base58decode", (e: Seq[Expression]) =>
      Registry.sie2(StringType, "base58Decode", e.take(1)),
      "base58Decode(s) - throws on invalid characters"),
    ("mortonencode", (e: Seq[Expression]) =>
      Registry.sie2(LongType, "mortonEncode",
        Seq(Cast(e(0), LongType), Cast(e(1), LongType))),
      "mortonEncode(x, y) - Z-order interleave of two UInt32 coordinates"),
    ("mortondecode", (e: Seq[Expression]) =>
      CreateNamedStruct(Seq(
        Literal("x"), Registry.sie2(LongType, "mortonDecodeX",
          Seq(Cast(e.head, LongType))),
        Literal("y"), Registry.sie2(LongType, "mortonDecodeY",
          Seq(Cast(e.head, LongType))))),
      "mortonDecode(z) - struct(x, y) of the interleaved coordinates"),
    ("bitmasktoarray", (e: Seq[Expression]) =>
      Registry.sie2(ArrayType(LongType, containsNull = false), "bitmaskToArray",
        Seq(Cast(e.head, LongType))),
      "bitmaskToArray(x) - set powers of two, ascending"),
    ("bitmasktolist", (e: Seq[Expression]) =>
      Registry.sie2(StringType, "bitmaskToList", Seq(Cast(e.head, LongType))),
      "bitmaskToList(x) - '1,4,16' style"),
    ("unbin", (e: Seq[Expression]) =>
      Registry.sie2(StringType, "unbin", Seq(Cast(e.head, StringType))),
      "unbin(s) - binary digits to string bytes (leading 0 bits implied)"),
    ("reinterpretasuint32", (e: Seq[Expression]) =>
      Registry.sie2(LongType, "reinterpretAsUInt32", Seq(Cast(e.head, StringType))),
      "reinterpretAsUInt32(s) - first 4 bytes little-endian"),
    ("murmurhash3_32", (e: Seq[Expression]) =>
      org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke(
        org.apache.spark.sql.graft.Murmur3.getClass, LongType, "murmur3_32",
        Seq(Cast(e.head, StringType)), returnNullable = false),
      "murmurHash3_32(s) - reference x86_32, seed 0, as UInt32 " +
        "(verified against Guava's canonical implementation)"),
    ("murmurhash3_128", (e: Seq[Expression]) =>
      org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke(
        org.apache.spark.sql.graft.Murmur3.getClass, BinaryType, "murmur3_128",
        Seq(Cast(e.head, StringType)), returnNullable = false),
      "murmurHash3_128(s) - canonical x64_128 (Guava direct), seed 0, " +
        "16 bytes (h1, h2 little-endian)"),
    ("jsontype", (e: Seq[Expression]) =>
      Registry.si(StringType, "jsonType", e.take(1)),
      "JSONType(s) - Object/Array/String/Int64/Double/Bool/Null; '' invalid"),
    ("greatcircleangle", (e: Seq[Expression]) =>
      org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke(
        org.apache.spark.sql.graft.GeoOps.getClass, DoubleType,
        "greatCircleAngle", e.take(4).map(Cast(_, DoubleType)),
        returnNullable = false),
      "greatCircleAngle(lon1, lat1, lon2, lat2) - central angle in degrees"),
    ("assumenotnull", (e: Seq[Expression]) => KnownNotNull(e.head),
      "assumeNotNull(x) - analyzer hint; caller asserts x is never null"),
    ("tonullable", (e: Seq[Expression]) => e.head,
      "toNullable(x) = x (every Spark column is already nullable)"),
    ("totime", (e: Seq[Expression]) => {
      val ts = Cast(e.head, TimestampType)
      // CH toTime: keep the time of day, move the date to 1970-01-02
      new TimestampAdd("SECOND",
        Subtract(Cast(ts, LongType), Cast(TruncTimestamp(Literal("day"), ts), LongType)),
        Cast(Literal("1970-01-02 00:00:00"), TimestampType))
    }, "toTime(ts) - time of day on the fixed date 1970-01-02"),
    ("tofixedstring", (e: Seq[Expression]) => {
      val n = Registry.constInt(e(1), "toFixedString")
      If(GreaterThan(Length(e.head), Literal(n)),
        Cast(RaiseError(Literal(s"toFixedString: value longer than $n")), StringType),
        StringRPad(e.head, Literal(n), Literal(" ")))
    }, "toFixedString(s, n) - NUL-padded to exactly n; throws when longer"),
    ("multiplydecimal", (e: Seq[Expression]) => {
      val scale = if (e.length > 2) Registry.constInt(e(2), "multiplyDecimal") else 4
      Cast(Multiply(Cast(e(0), DecimalType(38, 10)), Cast(e(1), DecimalType(38, 10))),
        DecimalType(38, scale))
    }, "multiplyDecimal(a, b[, scale=4]) - decimal product at explicit scale"),
    ("dividedecimal", (e: Seq[Expression]) => {
      val scale = if (e.length > 2) Registry.constInt(e(2), "divideDecimal") else 4
      Cast(Divide(Cast(e(0), DecimalType(38, 10)), Cast(e(1), DecimalType(38, 10))),
        DecimalType(38, scale))
    }, "divideDecimal(a, b[, scale=4]) - decimal quotient at explicit scale"),
    ("normalizequery", (e: Seq[Expression]) =>
      RegExpReplace(
        RegExpReplace(e.head, Literal("'([^']|'')*'"), Literal("?")),
        Literal("\\b\\d+(\\.\\d+)?\\b"), Literal("?")),
      "normalizeQuery(q) - string/number literals replaced with ? " +
        "(documented subset of CH's normalizer: no IN-list collapsing)"),
    ("format", (e: Seq[Expression]) => org.apache.spark.sql.graft.FormatCH(e),
      "format('{} and {1}', args...) - positional/indexed placeholders"),
    ("arrayreduce", (e: Seq[Expression]) => {
      val arr = e(1)
      val acc = UnresolvedNamedLambdaVariable(Seq("acc"))
      val x = UnresolvedNamedLambdaVariable(Seq("x"))
      val id = UnresolvedNamedLambdaVariable(Seq("acc"))
      Registry.constString(e(0), "arrayReduce").toLowerCase match {
        case "sum" => ArrayAggregate(Cast(arr, ArrayType(DoubleType)), Literal(0.0d),
          LambdaFunction(Add(acc, x), Seq(acc, x)), LambdaFunction(id, Seq(id)))
        case "product" => ArrayAggregate(Cast(arr, ArrayType(DoubleType)), Literal(1.0d),
          LambdaFunction(Multiply(acc, x), Seq(acc, x)), LambdaFunction(id, Seq(id)))
        case "min" => ArrayMin(arr)
        case "max" => ArrayMax(arr)
        case "count" => Cast(Size(arr), LongType)
        case "avg" => Divide(
          ArrayAggregate(Cast(arr, ArrayType(DoubleType)), Literal(0.0d),
            LambdaFunction(Add(acc, x), Seq(acc, x)), LambdaFunction(id, Seq(id))),
          Cast(Size(arr), DoubleType))
        case "uniqexact" | "uniq" => Cast(Size(ArrayDistinct(arr)), LongType)
        case other => throw new IllegalArgumentException(
          s"arrayReduce: unsupported aggregate '$other' " +
            "(supported: sum, product, min, max, count, avg, uniq, uniqExact)")
      }
    }, "arrayReduce('agg', arr) - sum/product/min/max/count/avg/uniq over an array"),
    ("tupleplus", (e: Seq[Expression]) =>
      org.apache.spark.sql.graft.TupleArith(e(0), e(1), "plus"),
      "tuplePlus(a, b) - field-wise sum as doubles"),
    ("tupleminus", (e: Seq[Expression]) =>
      org.apache.spark.sql.graft.TupleArith(e(0), e(1), "minus"),
      "tupleMinus(a, b)"),
    ("tuplemultiply", (e: Seq[Expression]) =>
      org.apache.spark.sql.graft.TupleArith(e(0), e(1), "multiply"),
      "tupleMultiply(a, b)"),
    ("tupledivide", (e: Seq[Expression]) =>
      org.apache.spark.sql.graft.TupleArith(e(0), e(1), "divide"),
      "tupleDivide(a, b) - IEEE double division per field"),
    ("tuplenegate", (e: Seq[Expression]) =>
      org.apache.spark.sql.graft.TupleNegate(e.head),
      "tupleNegate(a)"),
    ("tuplehammingdistance", (e: Seq[Expression]) =>
      org.apache.spark.sql.graft.TupleHammingDistance(e(0), e(1)),
      "tupleHammingDistance(a, b) - count of differing fields"),
    ("dictgethierarchy", (e: Seq[Expression]) =>
      org.apache.spark.sql.graft.DictHierarchyBuilder.buildHierarchy(e),
      "dictGetHierarchy('dict', 'parentAttr', key) - [key, parent, ...] " +
        "walked until miss/0/cycle"),
    ("dictisin", (e: Seq[Expression]) =>
      org.apache.spark.sql.graft.DictHierarchyBuilder.buildIsIn(e),
      "dictIsIn('dict', 'parentAttr', child, ancestor) - ancestor in chain"),

    // --- round-11 wave 3: ordered collection + sketch aggregates ---------
    ("grouparraysorted", (e: Seq[Expression]) =>
      org.apache.spark.sql.graft.GroupArraySortedAgg(e(0), e(1)),
      "groupArraySorted(x, n) - the n smallest values, ascending (O(n) state)"),
    ("grouparraylast", (e: Seq[Expression]) =>
      org.apache.spark.sql.graft.GroupArrayLastAgg(e(0), e(1), e(2)),
      "groupArrayLast(sortKey, x, n) - values at the n largest keys, " +
        "ascending (explicit-sort-key contract)"),
    ("grouparrayinsertat", (e: Seq[Expression]) =>
      org.apache.spark.sql.graft.GroupArrayInsertAtAgg(e(0), e(1),
        if (e.length > 2) e(2) else Literal(null),
        if (e.length > 3) e(3) else Literal(-1)),
      "groupArrayInsertAt(x, pos[, default[, size]]) - x at pos, default " +
        "elsewhere; collisions take the smallest value"),
    ("grouparraysample", (e: Seq[Expression]) =>
      org.apache.spark.sql.graft.GroupArraySampleAgg(e(0), e(1),
        if (e.length > 2) e(2) else Literal(123456)),
      "groupArraySample(x, n[, seed]) - deterministic bottom-k-by-hash " +
        "uniform sample (same sample at any partitioning, unlike CH's " +
        "row-order reservoir)"),
    ("histogram", (e: Seq[Expression]) =>
      org.apache.spark.sql.graft.HistogramAgg(e(0), e(1)),
      "histogram(x, N) - adaptive N-bin histogram as array<struct(lo, hi, " +
        "height)>; bf16-quantized exact state, merge-order-independent " +
        "(CH's own streaming sketch is order-sensitive)"),
    ("quantilebfloat16", (e: Seq[Expression]) =>
      org.apache.spark.sql.graft.QuantileBF16Agg(e(0),
        if (e.length > 1) e(1) else Literal(0.5d)),
      "quantileBFloat16(x[, level]) - type-1 quantile over bfloat16-" +
        "quantized values; <= 65536-bucket state, merge-order-independent"),
    ("categoricalinformationvalue", (e: Seq[Expression]) =>
      org.apache.spark.sql.graft.CategoricalIVAgg(e(0), e(1)),
      "categoricalInformationValue(cat, tag) - IV statistic, 1e-8-" +
        "quantized terms summed exactly"),
    ("quantiledeterministic", (e: Seq[Expression]) =>
      new Percentile(e(0), if (e.length > 2) e(2) else Literal(0.5d)),
      "quantileDeterministic(x, det[, level]) - graft evaluates EXACTLY " +
        "(the determinator is accepted for CH source compatibility; CH " +
        "uses it to seed a bounded sample, which exact evaluation subsumes)"),
    ("extractallgroupsvertical", (e: Seq[Expression]) =>
      org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke(
        org.apache.spark.sql.graft.RegexVerticalOps.getClass,
        ArrayType(ArrayType(StringType, containsNull = false),
          containsNull = false),
        "extractAllGroupsVertical", e.take(2), returnNullable = false),
      "extractAllGroupsVertical(s, re) - one inner array per match, " +
        "holding that match's capture groups"),
    ("arrayfill", (e: Seq[Expression]) =>
      org.apache.spark.sql.graft.ArrayFillMask(e(0), e(1)),
      "arrayFill(mask, arr) - where mask is false the previous kept " +
        "value carries forward (CH's lambda form takes a precomputed " +
        "boolean mask here; build it with arrayMap)"),
    ("jsonextract", (e: Seq[Expression]) => {
      require(e.length >= 3, "JSONExtract(json, key..., 'TypeName')")
      val path = Concat(Literal("$") +:
        e.slice(1, e.length - 1).flatMap(k => Seq(Literal("."), k)))
      val raw = GetJsonObject(e(0), path)
      Registry.constString(e.last, "JSONExtract type").toLowerCase match {
        case "string" => raw
        case "int64" | "int32" | "int" => Cast(raw, LongType)
        case "float64" | "double" | "float" => Cast(raw, DoubleType)
        case "bool" | "boolean" => Cast(raw, BooleanType)
        case other => throw new IllegalArgumentException(
          s"JSONExtract: unsupported type '$other' " +
            "(supported: String, Int64, Float64, Bool)")
      }
    }, "JSONExtract(json, key..., 'TypeName') - typed scalar extraction"))

  /** CH formatDateTime %-pattern → Java SimpleDateFormat pattern. */
  private[functions] def chFormatToJava(fmt: String): String = {
    val map = Map('Y' -> "yyyy", 'y' -> "yy", 'm' -> "MM", 'd' -> "dd",
      'H' -> "HH", 'i' -> "mm", 'S' -> "ss", 'j' -> "DDD",
      'F' -> "yyyy-MM-dd", 'T' -> "HH:mm:ss")
    val sb = new StringBuilder
    var i = 0
    def lit(s: String): Unit =
      if (s.nonEmpty) sb.append("'").append(s.replace("'", "''")).append("'")
    val run = new StringBuilder
    while (i < fmt.length) {
      val c = fmt.charAt(i)
      if (c == '%' && i + 1 < fmt.length) {
        val x = fmt.charAt(i + 1)
        if (x == '%') { run.append('%'); i += 2 }
        else map.get(x) match {
          case Some(p) =>
            lit(run.result()); run.clear(); sb.append(p); i += 2
          case None => throw new IllegalArgumentException(
            s"formatDateTime: unsupported symbol %$x " +
              "(supported: %Y %y %m %d %H %i %S %j %F %T %%)")
        }
      } else { run.append(c); i += 1 }
    }
    lit(run.result())
    sb.result()
  }

  /** Constant string arg (analysis-time; loud otherwise). */
  private def constString(e: Expression, fn: String): String = e match {
    case Literal(s: org.apache.spark.unsafe.types.UTF8String, _) => s.toString
    case _ => throw new IllegalArgumentException(
      s"$fn needle must be a constant string (ClickHouse contract)")
  }

  /** Constant int arg (analysis-time; loud otherwise). */
  private def constInt(e: Expression, fn: String): Int = e match {
    case Literal(i: Int, _) => i
    case Literal(l: Long, _) => l.toInt
    case _ => throw new IllegalArgumentException(
      s"$fn parameter must be an integer literal, got $e")
  }

  // SQL numeric literals like 0.5 parse as Decimal, not Double
  private def constDouble(e: Expression, fn: String): Double = e match {
    case Literal(d: org.apache.spark.sql.types.Decimal, _) => d.toDouble
    case Literal(n: Number, _) => n.doubleValue()
    case _ => throw new IllegalArgumentException(
      s"$fn parameter must be a numeric literal, got $e")
  }

  /** StaticInvoke shorthands for the round-11 kernel objects (codegen'd
    * static calls, null-propagating, non-null returns).
    */
  private def si(dt: org.apache.spark.sql.types.DataType, method: String,
      args: Seq[Expression]): Expression =
    org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke(
      org.apache.spark.sql.graft.MiscOps.getClass, dt, method, args,
      returnNullable = false)

  private def si6(dt: org.apache.spark.sql.types.DataType, method: String,
      args: Seq[Expression]): Expression =
    org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke(
      org.apache.spark.sql.graft.Ipv6Ops.getClass, dt, method, args,
      returnNullable = false)

  private def siu(dt: org.apache.spark.sql.types.DataType, method: String,
      args: Seq[Expression]): Expression =
    org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke(
      org.apache.spark.sql.graft.UrlOps.getClass, dt, method, args,
      returnNullable = false)

  private def sih(dt: org.apache.spark.sql.types.DataType, method: String,
      args: Seq[Expression]): Expression =
    org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke(
      org.apache.spark.sql.graft.SipHash.getClass, dt, method, args,
      returnNullable = false)

  private def sie2(dt: org.apache.spark.sql.types.DataType, method: String,
      args: Seq[Expression]): Expression =
    org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke(
      org.apache.spark.sql.graft.Encoding2Ops.getClass, dt, method, args,
      returnNullable = false)

  private def vcast(e: Expression): Expression =
    Cast(e, org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.FloatType))

  /** Vector-norm static call: `vecs` get the array<float> cast, `extra`
    * scalar params pass through.
    */
  private def vn(dt: org.apache.spark.sql.types.DataType, method: String,
      vecs: Seq[Expression], extra: Seq[Expression] = Nil): Expression =
    org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke(
      org.apache.spark.sql.graft.VectorNormOps.getClass, dt, method,
      vecs.map(vcast) ++ extra, returnNullable = false)

  /** Character n-grams (shared by the `ngrams` entry and ngramSimHash). */
  private def ngramsExpr(s: Expression, n: Expression): Expression = {
    val i = UnresolvedNamedLambdaVariable(Seq("i"))
    If(LessThan(Length(s), n),
      Literal.create(Array.empty[String],
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.StringType)),
      ArrayTransform(
        Sequence(Literal(1), Add(Subtract(Length(s), n), Literal(1)),
          Some(Literal(1))),
        LambdaFunction(Substring(s, i, n), Seq(i))))
  }

  /** Host part of a URL: optional scheme, optional userinfo@, up to the
    * first of :port / path / query / fragment.
    */
  private def urlDomain(url: Expression): Expression =
    RegExpExtract(url,
      Literal("^(?:[a-zA-Z][a-zA-Z0-9+.-]*:)?//(?:[^/@?#]*@)?([^/:?#]*)"),
      Literal(1))

  /** '$.k1.k2' JSONPath from the key argument list (string keys only). */
  private def jsonPath(keys: Seq[Expression]): Expression =
    Concat(Literal("$") +: keys.flatMap(k => Seq(Literal("."), k)))

  /** Floor a timestamp to a fixed `seconds` grid via epoch arithmetic
    * (timestamp↔long casts are whole seconds in Spark SQL semantics);
    * stays inside codegen.
    */
  private def epochFloor(ts: Expression, seconds: Long): Expression = {
    val l = Cast(ts, org.apache.spark.sql.types.LongType)
    Cast(Subtract(l, Pmod(l, Literal(seconds))),
      org.apache.spark.sql.types.TimestampType)
  }

  /** Imperative registration onto an existing session. Idempotent. */
  def registerAll(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    functions.foreach { case (name, builder, _) =>
      registry.createOrReplaceTempFunction(name, builder, "scala_udf")
    }
  }

  /** The (identifier, info, builder) triples for SparkSessionExtensions. */
  def injectable: Seq[(FunctionIdentifier, ExpressionInfo, FunctionBuilder)] =
    functions.map { case (name, builder, usage) =>
      (FunctionIdentifier(name), new ExpressionInfo("graft", name, usage), builder)
    }
}
