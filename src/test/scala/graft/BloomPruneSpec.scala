package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.BloomPrune

/** Bloom-filter join pruning: the pruned join must be value-identical to
  * the plain join (no false negatives — guaranteed by construction, and
  * checked here end-to-end), and the pruning predicate must actually cut
  * the fact side down to near the matching subset (false-positive rate
  * within a loose multiple of the configured fpp). */
class BloomPruneSpec extends AnyFunSuite with SparkSpec {

  test("prunedInnerJoin is value-identical to the plain inner join") {
    val fact = Tables.lineitem(spark, sf0)
      .select("l_suppkey", "l_orderkey", "l_extendedprice")
    val dim = Tables.supplier(spark, sf0)
      .filter(col("s_nationkey") === 3).select("s_suppkey", "s_name")

    val pruned = BloomPrune
      .prunedInnerJoin(fact, "l_suppkey", dim, "s_suppkey", 1000L, 0.01)
      .select("l_orderkey", "l_suppkey", "s_name")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted
    val plain = fact.join(dim, col("l_suppkey") === col("s_suppkey"))
      .select("l_orderkey", "l_suppkey", "s_name")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted

    assert(plain.nonEmpty)
    assert(pruned.toSeq === plain.toSeq)
  }

  test("bloom predicate passes every matching key and few non-matching ones") {
    val fact = Tables.lineitem(spark, sf0).select("l_suppkey")
    val dim = Tables.supplier(spark, sf0)
      .filter(col("s_nationkey") === 3).select("s_suppkey")
    val bloom = BloomPrune.buildKeyBloom(dim, "s_suppkey", 1000L, 0.01)

    val dimKeys = dim.collect().map(_.getLong(0)).toSet
    val total = fact.count()
    val matching = fact.filter(col("l_suppkey").isInCollection(dimKeys)).count()
    val survivors = fact.filter(BloomPrune.mightMatch(col("l_suppkey"), bloom)).count()

    // no false negatives: every matching row survives
    assert(survivors >= matching)
    // pruning effect: false positives bounded well under the non-matching
    // mass (fpp 1%; allow 10x slack on the tiny fixture)
    assert(survivors - matching <= math.max(10L, ((total - matching) * 0.1).toLong))
    assert(survivors < total)
  }

  test("empty dimension yields an empty filter that prunes everything") {
    val dim = Tables.supplier(spark, sf0).filter(col("s_suppkey") < 0)
    val bloom = BloomPrune.buildKeyBloom(dim, "s_suppkey", 1000L, 0.01)
    val survivors = Tables.lineitem(spark, sf0)
      .filter(BloomPrune.mightMatch(col("l_suppkey"), bloom)).count()
    assert(survivors === 0L)
  }
}
