package graft.functions

import java.util.regex.{Matcher, Pattern}

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.unsafe.types.UTF8String

/** Shared scalar kernel for the money parser — called from both the
  * interpreted path and the generated Java (Scala objects expose static
  * forwarders, so `ParseDollarsKernel.parse(...)` is valid generated code).
  *
  * Semantics match `graft.ops.TextParse.parseDollars` (the `when`-chain
  * form) exactly; the reference behavior is challenge2.py:114-157
  * ("$123.4 million" → 1.234e8, "$1.2 billion" → 1.2e9,
  * "$123,456,789" → 1.23456789e8, "millon" typo tolerated, else null),
  * after citation stripping and `$x–$y` range collapsing
  * (challenge2.py:111,168,175).
  */
object ParseDollarsKernel {
  private val Citation = Pattern.compile("""\[\d+\]\s*""")
  private val Range    = Pattern.compile("""\$.*[-—–](?![a-z])""")
  private val Million  = Pattern.compile("""(?i)\$\s*(\d+(?:\.\d+)?)\s*milli?on""")
  private val Billion  = Pattern.compile("""(?i)\$\s*(\d+(?:\.\d+)?)\s*billion""")
  private val Sep      = Pattern.compile("""\$\s*(\d{1,3}(?:[,.]\d{3})+)(?![,.\d])""")
  private val Plain    = Pattern.compile("""\$\s*(\d+(?:\.\d+)?)""")
  private val SepStrip = Pattern.compile("""[,.]""")

  def parse(input: UTF8String): java.lang.Double = {
    if (input == null) return null
    var s = Citation.matcher(input.toString).replaceAll("")
    s = Range.matcher(s).replaceAll(Matcher.quoteReplacement("$"))
    val m1 = Million.matcher(s)
    if (m1.find()) return java.lang.Double.valueOf(m1.group(1).toDouble * 1e6)
    val m2 = Billion.matcher(s)
    if (m2.find()) return java.lang.Double.valueOf(m2.group(1).toDouble * 1e9)
    val m3 = Sep.matcher(s)
    if (m3.find())
      return java.lang.Double.valueOf(SepStrip.matcher(m3.group(1)).replaceAll("").toDouble)
    val m4 = Plain.matcher(s)
    if (m4.find()) return java.lang.Double.valueOf(m4.group(1).toDouble)
    null
  }
}

/** Native Catalyst expression for the money parser (SURVEY.md §7.2 step 9).
  *
  * Versus the `when`-chain: ONE regex engine pass per pattern instead of
  * rlike + regexp_extract each re-running the same pattern (2× the regex
  * work), and precompiled `Pattern`s instead of Spark's per-expression
  * pattern cache lookups. Stays inside whole-stage codegen via doGenCode.
  */
case class ParseDollarsExpr(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "parse_dollars"

  override def nullSafeEval(input: Any): Any =
    ParseDollarsKernel.parse(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("parsed")
      s"""
         |java.lang.Double $tmp = graft.functions.ParseDollarsKernel.parse($c);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ParseDollarsExpr =
    copy(child = newChild)
}

/** Registration + Column-API surface for graft's native expressions. */
object GraftFunctions {

  /** Column API: parse_dollars as a native expression. */
  def parse_dollars(c: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      ParseDollarsExpr(org.apache.spark.sql.GraftColumnBridge.expression(c)))

  private val parseDollarsInfo = new ExpressionInfo(
    classOf[ParseDollarsExpr].getName, "parse_dollars")

  private val normalizeNfcInfo = new ExpressionInfo(
    classOf[NormalizeNfcExpr].getName, "normalize_nfc")

  /** SQL registration: `SELECT parse_dollars(col)` / `normalize_nfc(col)`
    * in spark.sql. */
  def register(spark: SparkSession): Unit = {
    injections.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
    // optimizer rules ride along (idempotent across repeated register calls)
    val rule = graft.plans.RegexAnchorSimplification
    if (!spark.experimental.extraOptimizations.contains(rule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ rule
  }

  /** Extract a literal-int function argument (the kernel params — hash
    * counts, shingle widths, bit counts — are plan-time constants, not
    * per-row data). */
  private def intLit(e: Expression, fn: String, arg: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be an INT literal, got $other")
  }

  private def info(cls: Class[_], name: String) = new ExpressionInfo(cls.getName, name)

  private[functions] def injections
      : Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("parse_dollars"), parseDollarsInfo,
      (children: Seq[Expression]) => ParseDollarsExpr(children.head)),
    (FunctionIdentifier("normalize_nfc"), normalizeNfcInfo,
      (children: Seq[Expression]) => NormalizeNfcExpr(children.head)),
    // kernels with plan-time int params: SELECT minhash_sig(tokens, 8) etc.
    (FunctionIdentifier("minhash_sig"), info(classOf[MinHashSigExpr], "minhash_sig"),
      (c: Seq[Expression]) =>
        MinHashSigExpr(c.head, intLit(c(1), "minhash_sig", "numHashes"))),
    (FunctionIdentifier("shingle_minhash_sig"),
      info(classOf[ShingleMinHashExpr], "shingle_minhash_sig"),
      (c: Seq[Expression]) => ShingleMinHashExpr(c.head,
        intLit(c(1), "shingle_minhash_sig", "k"),
        intLit(c(2), "shingle_minhash_sig", "numHashes"))),
    (FunctionIdentifier("shingle_hashes"),
      info(classOf[ShingleHashesExpr], "shingle_hashes"),
      (c: Seq[Expression]) =>
        ShingleHashesExpr(c.head, intLit(c(1), "shingle_hashes", "n"))),
    (FunctionIdentifier("simhash"), info(classOf[SimHashExpr], "simhash"),
      (c: Seq[Expression]) =>
        SimHashExpr(c.head, intLit(c(1), "simhash", "bits"))),
    (FunctionIdentifier("top_ngram_best"),
      info(classOf[TopNgramBestExpr], "top_ngram_best"),
      (c: Seq[Expression]) =>
        TopNgramBestExpr(c.head, intLit(c(1), "top_ngram_best", "n"))),
    (FunctionIdentifier("jaro_winkler"),
      info(classOf[JaroWinklerExpr], "jaro_winkler"),
      (c: Seq[Expression]) => JaroWinklerExpr(c.head, c(1))),
    // custom aggregates: the analyzer wraps a raw AggregateFunction from a
    // registry builder into its AggregateExpression, so these compose with
    // GROUP BY / FILTER like any built-in aggregate
    (FunctionIdentifier("bottom_k_sketch"),
      info(classOf[BottomKSketch], "bottom_k_sketch"),
      (c: Seq[Expression]) =>
        BottomKSketch(c.head, intLit(c(1), "bottom_k_sketch", "k"))),
    (FunctionIdentifier("misra_gries"),
      info(classOf[MisraGries], "misra_gries"),
      (c: Seq[Expression]) =>
        MisraGries(c.head, intLit(c(1), "misra_gries", "k"))),
    // portable cross-engine exp/ln (pure-IEEE kernel; PortableMath.scala)
    (FunctionIdentifier("portable_exp"),
      info(classOf[PortableExpExpr], "portable_exp"),
      (c: Seq[Expression]) => PortableExpExpr(c.head)),
    (FunctionIdentifier("portable_ln"),
      info(classOf[PortableLnExpr], "portable_ln"),
      (c: Seq[Expression]) => PortableLnExpr(c.head)))
}

/** SparkSessionExtensions entry point: pass
  * `spark.sql.extensions=graft.functions.GraftExtensions` and every session
  * gets graft's native functions without code changes. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    GraftFunctions.injections.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => graft.plans.RegexAnchorSimplification)
  }
}
