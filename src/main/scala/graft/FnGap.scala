package graft

import org.apache.spark.sql.SparkSession

/** Registry coverage audit vs the public ClickHouse function index
  * (r10 verdict item 6): diffs the names resolvable in a graft session
  * (Spark builtins + Registry.scala, both reachable from the dialect's
  * `spark.sql` surface) against a curated snapshot of the ClickHouse
  * documented function index (clickhouse.com/docs/sql-reference,
  * snapshot of the stable docs as of 2026-08). Prints per-category
  * covered/missing so future dialect rounds pick work from DATA, not
  * memory; the output is committed to SURVEY §16.
  *
  * Scope notes, deliberate:
  *   - categories that cannot be deterministic on Spark (random*,
  *     introspection, cluster/shard topology, interpreted machine-state)
  *     are listed as OUT OF SCOPE, not "missing";
  *   - a name counts covered when the session resolves it
  *     case-insensitively — CH is case-sensitive for most names but the
  *     reference's LLM emits the documented camelCase spellings, which
  *     Spark's lowercase-folding registry accepts.
  */
object FnGap {

  /** category -> documented CH names (public docs index, curated to the
    * entries a SQL user actually reaches; experimental and
    * cluster-topology names excluded or listed out-of-scope below).
    */
  val chIndex: Seq[(String, Seq[String])] = Seq(
    "arithmetic" -> Seq("plus", "minus", "multiply", "divide", "intDiv",
      "intDivOrZero", "modulo", "moduloOrZero", "negate", "abs", "gcd",
      "lcm", "max2", "min2", "multiplyDecimal", "divideDecimal"),
    "comparison" -> Seq("equals", "notEquals", "less", "greater",
      "lessOrEquals", "greaterOrEquals"),
    "logical" -> Seq("and", "or", "not", "xor"),
    "type_conversion" -> Seq("toInt8", "toInt16", "toInt32", "toInt64",
      "toUInt8", "toUInt16", "toUInt32", "toUInt64", "toFloat32",
      "toFloat64", "toDate", "toDateTime", "toString", "toFixedString",
      "toDecimal32", "toDecimal64", "reinterpretAsUInt32", "cast",
      "toIntervalSecond", "toIntervalMinute", "toIntervalHour",
      "toIntervalDay", "toIntervalWeek", "toIntervalMonth",
      "toIntervalYear", "parseDateTimeBestEffort",
      "parseDateTimeBestEffortOrNull", "toUnixTimestamp"),
    "dates_times" -> Seq("toYear", "toQuarter", "toMonth", "toDayOfYear",
      "toDayOfMonth", "toDayOfWeek", "toHour", "toMinute", "toSecond",
      "toStartOfYear", "toStartOfQuarter", "toStartOfMonth",
      "toStartOfWeek", "toStartOfDay", "toStartOfHour", "toStartOfMinute",
      "toStartOfInterval", "toTime", "toYYYYMM", "toYYYYMMDD", "now",
      "today", "yesterday", "timeSlot", "dateAdd", "dateSub", "dateDiff",
      "dateTrunc", "addYears", "addMonths", "addWeeks", "addDays",
      "addHours", "addMinutes", "addSeconds", "subtractYears",
      "subtractMonths", "subtractDays", "formatDateTime", "fromUnixTimestamp",
      "toLastDayOfMonth", "toMonday", "toRelativeDayNum"),
    "strings" -> Seq("empty", "notEmpty", "length", "lengthUTF8", "lower",
      "upper", "lowerUTF8", "upperUTF8", "repeat", "reverse", "concat",
      "concatWithSeparator", "substring", "substringUTF8", "appendTrailingCharIfAbsent",
      "startsWith", "endsWith", "trimLeft", "trimRight", "trimBoth",
      "leftPad", "rightPad", "splitByChar", "splitByString",
      "splitByRegexp", "alphaTokens", "ngrams", "tokens", "arrayStringConcat",
      "extractAllGroupsVertical", "normalizeQuery", "format", "soundex",
      "initcap", "left", "right", "space", "ascii"),
    "string_search" -> Seq("position", "positionCaseInsensitive", "locate",
      "match", "extract", "extractAll", "like", "notLike", "ilike",
      "countSubstrings", "countMatches", "hasToken",
      "hasTokenCaseInsensitive", "multiSearchAny",
      "multiSearchAllPositions", "multiSearchFirstPosition",
      "multiSearchFirstIndex"),
    "string_replace" -> Seq("replaceOne", "replaceAll", "replaceRegexpOne",
      "replaceRegexpAll", "overlay", "translate"),
    "string_distance" -> Seq("levenshteinDistance", "editDistance",
      "damerauLevenshteinDistance", "jaroSimilarity",
      "jaroWinklerSimilarity", "stringJaccardIndex", "ngramDistance"),
    "conditional" -> Seq("if", "multiIf", "greatest", "least"),
    "math" -> Seq("e", "pi", "exp", "log", "ln", "exp2", "log2", "exp10",
      "log10", "sqrt", "cbrt", "erf", "erfc", "lgamma", "tgamma", "sin",
      "cos", "tan", "asin", "acos", "atan", "atan2", "pow", "power",
      "intExp2", "intExp10", "cosh", "sinh", "tanh", "hypot", "log1p",
      "sign", "degrees", "radians", "factorial"),
    "rounding" -> Seq("floor", "ceil", "ceiling", "round", "roundBankers",
      "trunc", "truncate", "roundToExp2", "roundDuration", "roundAge",
      "roundDown"),
    "arrays" -> Seq("array", "arrayConcat", "arrayElement", "has", "hasAll",
      "hasAny", "hasSubstr", "indexOf", "countEqual", "arrayEnumerate",
      "arrayEnumerateUniq", "arrayPopBack", "arrayPopFront", "arrayPushBack",
      "arrayPushFront", "arrayResize", "arraySlice", "arraySort",
      "arrayReverseSort", "arrayUniq", "arrayJoin", "arrayDifference",
      "arrayDistinct", "arrayIntersect", "arrayReduce", "arrayReverse",
      "arrayFlatten", "arrayCompact", "arrayZip", "arrayMap", "arrayFilter",
      "arrayExists", "arrayAll", "arrayFirst", "arrayFirstIndex", "arrayMin",
      "arrayMax", "arraySum", "arrayAvg", "arrayCumSum", "arrayProduct",
      "arrayStringConcat", "range", "emptyArrayUInt64", "arrayCount",
      "arrayFill", "arrayRotateLeft", "arrayRotateRight"),
    "maps" -> Seq("map", "mapKeys", "mapValues", "mapContains", "mapAdd",
      "mapSubtract", "mapFromArrays", "mapFilter", "mapApply", "mapUpdate"),
    "json" -> Seq("JSONExtract", "JSONExtractString", "JSONExtractInt",
      "JSONExtractFloat", "JSONExtractBool", "JSONExtractRaw",
      "JSONExtractArrayRaw", "JSONExtractKeys", "JSONHas", "JSONLength",
      "JSONType", "isValidJSON", "visitParamExtractString", "simpleJSONExtractString"),
    "url" -> Seq("protocol", "domain", "domainWithoutWWW", "topLevelDomain",
      "path", "pathFull", "queryString", "fragment", "queryStringAndFragment",
      "extractURLParameter", "extractURLParameters", "extractURLParameterNames",
      "URLHierarchy", "URLPathHierarchy", "cutQueryString", "cutFragment",
      "cutWWW", "decodeURLComponent", "encodeURLComponent", "netloc",
      "firstSignificantSubdomain", "cutToFirstSignificantSubdomain"),
    "ip" -> Seq("IPv4NumToString", "IPv4StringToNum", "IPv4StringToNumOrNull",
      "isIPv4String", "isIPv6String", "IPv4ToIPv6", "IPv6NumToString",
      "IPv6StringToNum", "IPv4CIDRToRange", "isIPAddressInRange"),
    "encoding" -> Seq("hex", "unhex", "base64Encode", "base64Decode",
      "tryBase64Decode", "base58Encode", "base58Decode", "bin", "unbin",
      "bitmaskToList", "bitmaskToArray", "char", "mortonEncode", "mortonDecode"),
    "bit" -> Seq("bitAnd", "bitOr", "bitXor", "bitNot", "bitShiftLeft",
      "bitShiftRight", "bitRotateLeft", "bitRotateRight", "bitTest",
      "bitTestAll", "bitTestAny", "bitCount", "bitHammingDistance"),
    "hash" -> Seq("halfMD5", "MD5", "SHA1", "SHA224", "SHA256", "cityHash64",
      "sipHash64", "sipHash128", "farmHash64", "xxHash32", "xxHash64",
      "wyHash64", "murmurHash3_32", "murmurHash2_64", "murmurHash3_64", "murmurHash3_128",
      "javaHash", "hiveHash", "metroHash64", "ngramSimHash", "wordShingleSimHash",
      "ngramMinHash", "wordShingleMinHash"),
    "distance_vector" -> Seq("L1Distance", "L2Distance", "L2SquaredDistance",
      "LinfDistance", "LpDistance", "cosineDistance", "dotProduct",
      "L1Norm", "L2Norm", "LinfNorm", "LpNorm", "normalizeL1", "normalizeL2"),
    "geo" -> Seq("greatCircleDistance", "geoDistance", "greatCircleAngle",
      "pointInPolygon", "geohashEncode", "geohashDecode"),
    "nullable" -> Seq("isNull", "isNotNull", "coalesce", "ifNull", "nullIf",
      "assumeNotNull", "toNullable"),
    "tuples" -> Seq("tuple", "tupleElement", "tupleHammingDistance",
      "tuplePlus", "tupleMinus", "tupleMultiply", "tupleDivide", "tupleNegate"),
    "other" -> Seq("basename", "toTypeName", "materialize",
      "ignore", "currentDatabase", "transform", "formatReadableSize",
      "formatReadableQuantity", "formatReadableDecimalSize", "formatReadableTimeDelta",
      "bar", "sparkbar", "isFinite", "isInfinite", "isNaN", "throwIf",
      "identity", "indexHint", "countDigits", "extractKeyValuePairs"),
    "aggregates" -> Seq("count", "min", "max", "sum", "avg", "any",
      "anyLast", "anyHeavy", "stddevPop", "stddevSamp", "varPop", "varSamp",
      "covarPop", "covarSamp", "corr", "argMin", "argMax", "avgWeighted",
      "topK", "topKWeighted", "groupArray", "groupArrayLast",
      "groupUniqArray", "groupArrayInsertAt", "groupArrayMovingSum",
      "groupArrayMovingAvg", "groupArraySample", "groupBitAnd", "groupBitOr",
      "groupBitXor", "groupBitmap", "groupBitmapAnd", "groupBitmapOr",
      "sumWithOverflow", "sumMap", "minMap", "maxMap", "skewPop", "skewSamp",
      "kurtPop", "kurtSamp", "uniq", "uniqExact", "uniqCombined", "uniqHLL12",
      "quantile", "quantiles", "quantileExact", "quantilesExact",
      "quantileTDigest", "quantileTDigestWeighted", "quantileDeterministic",
      "median", "rankCorr", "simpleLinearRegression", "entropy",
      "maxIntersections", "maxIntersectionsPosition", "intervalLengthSum",
      "deltaSum", "deltaSumTimestamp", "exponentialMovingAverage",
      "largestTriangleThreeBuckets", "histogram", "contingency", "cramersV",
      "cramersVBiasCorrected", "theilsU", "meanZTest", "studentTTest",
      "welchTTest", "mannWhitneyUTest", "kolmogorovSmirnovTest",
      "boundingRatio", "sumCount", "sumKahan", "first_value", "last_value",
      "windowFunnel", "retention", "sequenceMatch", "sequenceCount",
      "uniqUpTo", "categoricalInformationValue", "quantileGK", "quantileBFloat16"),
    "bitmap_funcs" -> Seq("bitmapBuild", "bitmapToArray", "bitmapAnd",
      "bitmapOr", "bitmapXor", "bitmapAndnot", "bitmapCardinality",
      "bitmapAndCardinality", "bitmapOrCardinality", "bitmapContains",
      "bitmapHasAll", "bitmapHasAny", "bitmapMin", "bitmapMax",
      "bitmapSubsetInRange", "bitmapSubsetLimit"),
    "dictionaries" -> Seq("dictGet", "dictGetOrDefault", "dictGetOrNull",
      "dictHas", "dictGetHierarchy", "dictIsIn"),
    "window" -> Seq("row_number", "rank", "dense_rank", "lagInFrame",
      "leadInFrame", "nth_value"))

  /** Documented categories DELIBERATELY out of scope (nondeterministic,
    * cluster-topology, or machine-introspection — meaningless or harmful
    * on a deterministic distributed engine), kept visible so the audit
    * is honest about what it is not counting.
    */
  val outOfScope: Seq[(String, String)] = Seq(
    ("random", "rand/randNormal/randomString/... — nondeterministic by design; " +
      "graft's sampling is seeded-LCG (q111) and sampleByKey"),
    ("uuid", "generateUUIDv4/... — nondeterministic; snowflakeToDateTime-class " +
      "converters would be mechanical adds"),
    ("cluster", "cluster/shardNum/hostName topology — no meaning off ClickHouse"),
    ("server_state", "hostName/FQDN/getMacro/uptime/version/currentUser/sleep/" +
      "blockSize/byteSize/visibleWidth/errorCodeToName/getSizeOfEnumType — " +
      "server/environment introspection; nondeterministic across a fleet"),
    ("block_local", "neighbor/runningDifference/runningAccumulate/" +
      "rowNumberInBlock/rowNumberInAllBlocks — CH block-local semantics " +
      "(results depend on physical block boundaries; CH's own docs point " +
      "to window functions, which graft serves)"),
    ("introspection", "addressToLine/demangle/tid — native-binary introspection"),
    ("encryption", "encrypt/decrypt/aes_* — key management out of the data plane"),
    ("embedded_dicts", "regionToCity/regionToCountry/... — Yandex geobase relics"),
    ("nlp_experimental", "stem/lemmatize/synonyms — require external model files"),
    ("time_series_experimental", "seriesOutliersDetectTukey/seriesPeriodDetectFFT " +
      "— CH marks experimental; LTTB/EMA/histogram cover the stable set"),
    ("sequence_next_node", "sequenceNextNode — CH experimental, excluded in SURVEY §15"),
    ("h3_geo", "h3ToGeo/geoToH3/h3* — require the Uber H3 grid system " +
      "(CH links libh3); graft's geo dialect covers the distance/geohash/" +
      "polygon surface"),
    ("nondeterministic_array", "arrayShuffle — nondeterministic by design"),
    ("parser_level", "untuple — star-expansion syntax, a parser feature " +
      "not a function; Spark spells it struct.*"))

  /** Spark-builtin aliases: a CH name whose semantics Spark serves under
    * a DIFFERENT builtin spelling the dialect user would find naturally.
    * Counted as covered-with-alias (reported separately for honesty).
    */
  val aliased: Map[String, String] = Map(
    "if" -> "CASE WHEN / if()", "cast" -> "CAST(x AS t)",
    "and" -> "AND", "or" -> "OR", "not" -> "NOT", "xor" -> "!=/xor",
    "plus" -> "+", "minus" -> "-", "multiply" -> "*", "divide" -> "/",
    "modulo" -> "%", "negate" -> "-x",
    "equals" -> "=", "notEquals" -> "!=", "less" -> "<", "greater" -> ">",
    "lessOrEquals" -> "<=", "greaterOrEquals" -> ">=",
    "like" -> "LIKE", "notLike" -> "NOT LIKE",
    "arrayElement" -> "a[i] / element_at", "array" -> "array()",
    "tuple" -> "struct()", "tupleElement" -> "struct.field",
    "range" -> "sequence()", "empty" -> "length(x)=0", "notEmpty" -> "length(x)>0",
    "median" -> "percentile(x, 0.5)", "locate" -> "locate")

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftSession.install(spark)
    val resolvable: Set[String] =
      spark.sessionState.functionRegistry.listFunction()
        .map(_.funcName.toLowerCase).toSet
    var tot = 0; var cov = 0; var ali = 0
    val gaps = scala.collection.mutable.ArrayBuffer.empty[(String, Seq[String])]
    println("| category | documented | covered | aliased | missing |")
    println("|---|---|---|---|---|")
    chIndex.foreach { case (cat, names) =>
      val missing = names.filterNot(n => resolvable.contains(n.toLowerCase)
        || aliased.contains(n))
      val aliasedHere = names.count(n => !resolvable.contains(n.toLowerCase)
        && aliased.contains(n))
      tot += names.length; cov += names.length - missing.length - aliasedHere
      ali += aliasedHere
      println(s"| $cat | ${names.length} | ${names.length - missing.length - aliasedHere} " +
        s"| $aliasedHere | ${missing.length} |")
      if (missing.nonEmpty) gaps += cat -> missing
    }
    println(s"| TOTAL | $tot | $cov | $ali | ${tot - cov - ali} |")
    println()
    println("Remaining gaps by category:")
    gaps.foreach { case (cat, names) =>
      println(s"  $cat: ${names.mkString(", ")}")
    }
    println()
    println("Out of scope (documented, deliberately not counted):")
    outOfScope.foreach { case (cat, why) => println(s"  $cat: $why") }
    spark.stop()
  }
}
