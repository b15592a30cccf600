package graft

import org.apache.spark.sql.catalyst.expressions.{EndsWith, EqualTo, RLike, StartsWith}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions

/** RegexAnchorSimplification: anchored-literal RLIKE predicates must
  * become pushable string predicates WITHOUT changing a single answer —
  * the rewrite is judged on the pushed-filter list AND on value
  * equivalence against the regex engine's own verdicts. */
class RegexRewriteSpec extends AnyFunSuite with SparkSpec
    with AdaptiveSparkPlanHelper {

  GraftFunctions.register(spark)

  private lazy val dir = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-rx").toString
    val rows = Seq("abc", "abd", "xabc", "cab", "ab", "a^b", "", "zzab")
      .zipWithIndex.map { case (s, i) => (i.toLong, s) }
    rows.toDF("id", "s").write.mode("overwrite").parquet(s"$d/t")
    s"$d/t"
  }

  private def regexTruth(pattern: String): Set[Long] = {
    import spark.implicits._
    val p = java.util.regex.Pattern.compile(pattern)
    spark.read.parquet(dir).as[(Long, String)].collect()
      .filter { case (_, s) => s != null && p.matcher(s).find() }
      .map(_._1).toSet
  }

  private def sparkIds(pattern: String) = {
    import spark.implicits._
    spark.read.parquet(dir).filter(col("s").rlike(pattern))
      .select("id").as[Long].collect().toSet
  }

  test("prefix anchor: rewritten to StartsWith, pushed, value-exact") {
    val q = spark.read.parquet(dir).filter(col("s").rlike("^ab"))
    val opt = q.queryExecution.optimizedPlan
    val rlikes = opt.expressions.flatMap(_.collect { case r: RLike => r })
    assert(rlikes.isEmpty, s"RLike survived optimization:\n$opt")
    assert(opt.expressions.flatMap(_.collect { case s: StartsWith => s }).nonEmpty)
    q.write.format("noop").mode("overwrite").save()
    val scan = collectWithSubqueries(q.queryExecution.executedPlan) {
      case s: FileSourceScanExec => s
    }.head
    assert(scan.metadata("PushedFilters").contains("StringStartsWith(s,ab)"),
      s"prefix not pushed: ${scan.metadata("PushedFilters")}")
    assert(sparkIds("^ab") === regexTruth("^ab"))
  }

  test("full anchor rewrites to equality; suffix anchor to EndsWith") {
    val eq = spark.read.parquet(dir).filter(col("s").rlike("^abc$"))
      .queryExecution.optimizedPlan
    assert(eq.expressions.flatMap(_.collect { case e: EqualTo => e }).nonEmpty,
      s"^abc$$ did not become equality:\n$eq")
    val sfx = spark.read.parquet(dir).filter(col("s").rlike("bc$"))
      .queryExecution.optimizedPlan
    assert(sfx.expressions.flatMap(_.collect { case e: EndsWith => e }).nonEmpty,
      s"bc$$ did not become EndsWith:\n$sfx")
    assert(sparkIds("^abc$") === regexTruth("^abc$"))
    assert(sparkIds("bc$") === regexTruth("bc$"))
  }

  test("NOT rlike masks rewrite through the negation, value-exact") {
    import spark.implicits._
    val got = spark.read.parquet(dir).filter(!col("s").rlike("^ab"))
      .select("id").as[Long].collect().toSet
    val all = spark.read.parquet(dir).select("id").as[Long].collect().toSet
    assert(got === all -- regexTruth("^ab"))
  }

  test("unanchored literal rewrites to Contains, value-exact") {
    val opt = spark.read.parquet(dir).filter(col("s").rlike("ab"))
      .queryExecution.optimizedPlan
    assert(opt.expressions.flatMap(_.collect {
      case c: org.apache.spark.sql.catalyst.expressions.Contains => c
    }).nonEmpty, s"'ab' did not become Contains:\n$opt")
    assert(sparkIds("ab") === regexTruth("ab"))
  }

  test("metacharacter patterns are left for the regex engine, unchanged") {
    for (p <- Seq("^ab.*c", "^a[bc]", "^", "^a$b", "^a\\d", "a|b")) {
      val opt = spark.read.parquet(dir).filter(col("s").rlike(p))
        .queryExecution.optimizedPlan
      val rlikes = opt.expressions.flatMap(_.collect { case r: RLike => r })
      assert(rlikes.nonEmpty, s"pattern '$p' was wrongly rewritten:\n$opt")
      assert(sparkIds(p) === regexTruth(p), s"pattern '$p' answers moved")
    }
  }
}
