package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry.FunctionBuilder
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.graft.{ChLength, CosineDistance, CosineDistanceF16, CosineDistancePacked, InnerProduct, L2Distance, NeuralArray, ParseDateTimeBestEffort, SimHash64, VecPack, VecPackF16, VecUnpack, VecUnpackF16, VectorAvg}

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
    // length — overloaded over strings and arrays in ClickHouse (§2.8)
    ("length", (e: Seq[Expression]) => ChLength(e.head),
      "length(x) - ClickHouse overload: chars for strings, size for arrays"),
    // today() — prompts.py:39
    ("today", (_: Seq[Expression]) => CurrentDate(),
      "today() = current_date"),
    // JSONExtractString(json, key) — docs/vector-sql.md:204-209
    ("jsonextractstring",
      (e: Seq[Expression]) =>
        GetJsonObject(e(0), Concat(Seq(Literal("$."), e(1)))),
      "JSONExtractString(json, k) = get_json_object(json, '$.k')"),
    ("jsonextractint",
      (e: Seq[Expression]) =>
        Cast(GetJsonObject(e(0), Concat(Seq(Literal("$."), e(1)))),
          org.apache.spark.sql.types.LongType),
      "JSONExtractInt(json, k) - extract and cast to bigint"),
    ("jsonextractfloat",
      (e: Seq[Expression]) =>
        Cast(GetJsonObject(e(0), Concat(Seq(Literal("$."), e(1)))),
          org.apache.spark.sql.types.DoubleType),
      "JSONExtractFloat(json, k) - extract and cast to double"),
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
      "JSONExtractArrayRaw(json, k) - JSON array field as array<string>"))

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
