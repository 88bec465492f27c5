package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash (Charikar 2002) of a text column, as a native
  * Catalyst expression: `doGenCode` emits a static call so the whole
  * stage stays in generated code (no UDF serialization, no
  * InternalRow boxing). The scalar kernel lives in SimHashImpl so the
  * interpreted and codegen paths share one implementation.
  *
  * Beyond-reference operator (SURVEY.md §7 slice 5): the reference's
  * only hash is the FNV-1a shuffle partitioner
  * (/root/reference/mr/worker.go:25-29); SimHash is the near-dup
  * fingerprint a training-data pipeline needs at 100 TB — one pass,
  * 8 bytes per doc, hamming distance ≈ cosine distance on token sets.
  */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  protected override def nullSafeEval(input: Any): Any =
    SimHashImpl.simhash64(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SimHashImpl.simhash64($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHashImpl {
  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Per-token hash = first 8 bytes of md5(utf8(token)), big-endian.
    * md5 (not FNV/xxhash) so the signature is engine-portable: any SQL
    * engine with md5() reproduces these bit votes from the hex string
    * (`dedup_simhash`'s oracle does exactly that nibble-by-nibble). */
  def tokenHash64(s: String): Long = {
    val d = md5Local.get()
    d.reset()
    val bytes = d.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (bytes(i) & 0xFFL); i += 1 }
    h
  }

  /** Token = maximal run of Unicode letters (reference tokenizer),
    * iterated by code point so supplementary-plane letters match the
    * regex engines' \p{L} semantics. Every occurrence votes (simhash
    * weights = term frequency, Charikar 2002 §3). */
  def simhash64(text: String): Long = {
    val votes = new Array[Int](64)
    var i = 0
    val n = text.length
    while (i < n) {
      var cp = text.codePointAt(i)
      while (i < n && !Character.isLetter(cp)) {
        i += Character.charCount(cp)
        if (i < n) cp = text.codePointAt(i)
      }
      val start = i
      while (i < n && Character.isLetter(cp)) {
        i += Character.charCount(cp)
        if (i < n) cp = text.codePointAt(i)
      }
      if (i > start) {
        val h = tokenHash64(text.substring(start, i))
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}

object GraftFunctions {
  /** Column API — resolved through the function registry (Spark 4
    * keeps Column↔Expression construction internal), so call
    * registerAll(spark) once per session first. */
  def simhash64(c: Column): Column =
    org.apache.spark.sql.functions.call_function("simhash64", c)

  def cosineSim(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function("cosine_sim_f", a, b)

  def sqDistF(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function("sq_dist_f", a, b)

  private[functions] def arity(name: String, n: Int)(
      exprs: Seq[Expression]): Seq[Expression] = {
    if (exprs.length != n)
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        messageParameters = Map("functionName" -> name,
          "expectedNum" -> n.toString, "actualNum" -> exprs.length.toString,
          "docroot" -> "https://spark.apache.org/docs/latest"))
    exprs
  }

  def misraGries(c: Column, k: Int): Column =
    org.apache.spark.sql.functions.call_function(
      "misra_gries", c, org.apache.spark.sql.functions.lit(k))

  def charNgramCounts(c: Column, n: Int): Column =
    org.apache.spark.sql.functions.call_function(
      "char_ngram_counts", c, org.apache.spark.sql.functions.lit(n))

  /** Spark's native bloom build/probe pair (the expressions behind
    * runtime row-level filtering), surfaced with their upstream SQL
    * names — BloomPrefilter keys its sketch on xxhash64 longs through
    * these so the probe stays inside whole-stage codegen. */
  def bloomFilterAgg(c: Column, estimatedItems: Long, numBits: Long): Column =
    org.apache.spark.sql.functions.call_function("bloom_filter_agg", c,
      org.apache.spark.sql.functions.lit(estimatedItems),
      org.apache.spark.sql.functions.lit(numBits))

  def mightContain(bloom: Column, value: Column): Column =
    org.apache.spark.sql.functions.call_function("might_contain", bloom, value)

  private[functions] def bloomAggFromExprs(exprs: Seq[Expression]) = {
    val es = arity("bloom_filter_agg", 3)(exprs)
    new org.apache.spark.sql.catalyst.expressions.aggregate
      .BloomFilterAggregate(es(0), es(1), es(2))
  }

  private[functions] def mightContainFromExprs(exprs: Seq[Expression]) = {
    val es = arity("might_contain", 2)(exprs)
    org.apache.spark.sql.catalyst.expressions
      .BloomFilterMightContain(es(0), es(1))
  }

  /** The n argument must be a foldable integer literal (it is part of
    * the expression's shape, not per-row data). */
  private[functions] def ngramFromExprs(exprs: Seq[Expression]): CharNgramCounts = {
    val es = arity("char_ngram_counts", 2)(exprs)
    if (!es(1).foldable)
      throw new IllegalArgumentException(
        "char_ngram_counts: n must be a literal integer")
    CharNgramCounts(es(0), es(1).eval().asInstanceOf[Number].intValue())
  }

  /** The k argument must be a foldable integer literal (it sizes the
    * aggregation buffer, so it cannot vary per row). */
  private[functions] def mgFromExprs(exprs: Seq[Expression]): MisraGriesAgg = {
    val es = arity("misra_gries", 2)(exprs)
    if (!es(1).foldable)
      throw new IllegalArgumentException(
        "misra_gries: k must be a literal integer")
    MisraGriesAgg(es(0), es(1).eval().asInstanceOf[Number].intValue())
  }

  /** SQL + Column registration: SELECT simhash64(text) FROM ... */
  def registerAll(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash64", exprs => SimHash64(arity("simhash64", 1)(exprs).head),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim_f", exprs => {
        val e = arity("cosine_sim_f", 2)(exprs); CosineSimF(e(0), e(1))
      }, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sq_dist_f", exprs => {
        val e = arity("sq_dist_f", 2)(exprs); SqDistF(e(0), e(1))
      }, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "misra_gries", mgFromExprs, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "char_ngram_counts", ngramFromExprs, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_filter_agg", bloomAggFromExprs, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "might_contain", mightContainFromExprs, "built-in")
  }
}

/** SparkSessionExtensions entry point: inject the graft functions at
  * session build time —
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `--conf spark.sql.extensions=graft.functions.GraftExtensions`. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
    e.injectFunction((FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (exprs: Seq[Expression]) =>
        SimHash64(GraftFunctions.arity("simhash64", 1)(exprs).head)))
    e.injectFunction((FunctionIdentifier("cosine_sim_f"),
      new ExpressionInfo(classOf[CosineSimF].getName, "cosine_sim_f"),
      (exprs: Seq[Expression]) => {
        val es = GraftFunctions.arity("cosine_sim_f", 2)(exprs)
        CosineSimF(es(0), es(1))
      }))
    e.injectFunction((FunctionIdentifier("sq_dist_f"),
      new ExpressionInfo(classOf[SqDistF].getName, "sq_dist_f"),
      (exprs: Seq[Expression]) => {
        val es = GraftFunctions.arity("sq_dist_f", 2)(exprs)
        SqDistF(es(0), es(1))
      }))
    e.injectFunction((FunctionIdentifier("misra_gries"),
      new ExpressionInfo(classOf[MisraGriesAgg].getName, "misra_gries"),
      (exprs: Seq[Expression]) => GraftFunctions.mgFromExprs(exprs)))
    e.injectFunction((FunctionIdentifier("char_ngram_counts"),
      new ExpressionInfo(classOf[CharNgramCounts].getName, "char_ngram_counts"),
      (exprs: Seq[Expression]) => GraftFunctions.ngramFromExprs(exprs)))
    e.injectFunction((FunctionIdentifier("bloom_filter_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "bloom_filter_agg"),
      (exprs: Seq[Expression]) => GraftFunctions.bloomAggFromExprs(exprs)))
    e.injectFunction((FunctionIdentifier("might_contain"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "might_contain"),
      (exprs: Seq[Expression]) => GraftFunctions.mightContainFromExprs(exprs)))
    e.injectPlannerStrategy(_ => graft.plans.AsOfStrategy)
    e.injectOptimizerRule(_ => graft.plans.PruneAsOfJoinColumns)
  }
}
