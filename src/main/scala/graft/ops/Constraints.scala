package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraints evaluated into one report table —
  * the contract-checking stage a production pipeline runs between ingest
  * and publish (same capability class as Deequ's checks, re-expressed as
  * plain aggregates).
  *
  * Scale shape: all ROW-LOCAL constraints (not-null, range, predicate)
  * fold into a SINGLE aggregation pass over the table — adding a check
  * adds a counter, not a scan. Uniqueness is its own key-shuffle
  * (count-minus-distinct needs per-key state), and referential integrity
  * is a broadcast/shuffled anti-join against the dimension — each the
  * minimal plan for its semantics. The report is rows of
  * (constraint, violations, pass), so gating a publish is
  * `report.filter(!pass).isEmpty` and auditing is a table scan.
  */
object Constraints {

  sealed trait Check { def name: String }
  /** violations = rows where `c` is null. */
  final case class NotNull(c: String) extends Check { def name = s"not_null($c)" }
  /** violations = rows beyond [lo, hi] (nulls don't violate range —
    * compose with NotNull to forbid them). */
  final case class InRange(c: String, lo: Double, hi: Double) extends Check {
    def name = s"in_range($c,$lo,$hi)"
  }
  /** violations = rows failing an arbitrary row-local predicate. */
  final case class Satisfies(label: String, pred: Column) extends Check {
    def name = s"satisfies($label)"
  }
  /** violations = rows in excess of one per key tuple. */
  final case class Unique(cols: Seq[String]) extends Check {
    def name = s"unique(${cols.mkString(",")})"
  }
  /** violations = rows whose `c` has no partner in `dim.dimKey`
    * (null FKs violate — forbid or filter upstream if optional). */
  final case class RefIntegrity(c: String, dim: DataFrame, dimKey: String) extends Check {
    def name = s"ref_integrity($c)"
  }

  /** Evaluate all checks over `df` into (constraint, violations, pass),
    * one row per check, ordered by constraint name. */
  def report(df: DataFrame, checks: Seq[Check]): DataFrame = {
    val rowLocal = checks.collect {
      case c: NotNull =>
        (c.name, sum(when(col(c.c).isNull, 1L).otherwise(0L)))
      case c: InRange =>
        (c.name, sum(when(col(c.c) < c.lo || col(c.c) > c.hi, 1L).otherwise(0L)))
      case c: Satisfies =>
        (c.name, sum(when(!coalesce(c.pred, lit(false)), 1L).otherwise(0L)))
    }
    val localReport: Option[DataFrame] =
      if (rowLocal.isEmpty) None
      else Some {
        val agg = df.agg(rowLocal.head._2.alias("v0"),
          rowLocal.tail.zipWithIndex.map { case ((_, e), i) => e.alias(s"v${i + 1}") }: _*)
        val pairs = rowLocal.zipWithIndex.map { case ((n, _), i) =>
          struct(lit(n).alias("constraint"),
            coalesce(col(s"v$i"), lit(0L)).alias("violations"))
        }
        agg.select(explode(array(pairs: _*)).alias("r"))
          .select(col("r.constraint"), col("r.violations"))
      }
    val uniques = checks.collect { case c: Unique =>
      df.groupBy(c.cols.map(col): _*).agg(count(lit(1)).alias("__n"))
        .agg(coalesce(sum(col("__n") - 1), lit(0L)).alias("violations"))
        .select(lit(c.name).alias("constraint"), col("violations"))
    }
    // NULL foreign keys are NOT violations (ANSI referential-integrity
    // semantics: a null FK references nothing). They're filtered out
    // before the anti-join so Spark and any NOT-EXISTS oracle agree even
    // when the dim key column contains nulls — a NOT IN formulation
    // would silently collapse to zero violations in that case.
    val fks = checks.collect { case c: RefIntegrity =>
      df.select(col(c.c)).filter(col(c.c).isNotNull)
        .join(c.dim.select(col(c.dimKey).alias(c.c)).distinct(), Seq(c.c), "left_anti")
        .agg(count(lit(1)).alias("violations"))
        .select(lit(c.name).alias("constraint"), col("violations"))
    }
    (localReport.toSeq ++ uniques ++ fks)
      .reduce(_ unionByName _)
      .withColumn("pass", col("violations") === 0L)
      .orderBy("constraint")
  }

  /** k-anonymity / l-diversity audit — the privacy companion to the PII
    * scrubber: for each quasi-identifier combination, how many records
    * share it (k-anonymity: every combo ≥ k means no one is singled out
    * by the QI columns alone) and how many DISTINCT sensitive values it
    * carries (l-diversity: a k-anonymous group whose sensitive value is
    * unanimous still leaks it). One aggregation keyed by the QI tuple —
    * count plus exact distinct-sensitive per group (two-phase under the
    * hood); output is QI-domain-sized, never row-sized. Rows with a
    * null QI component form their own combos (null IS a disclosure
    * class). */
  def kAnonymityReport(df: DataFrame, quasiIds: Seq[Column],
                       names: Seq[String], sensitive: Column,
                       k: Int, l: Int): DataFrame = {
    require(quasiIds.nonEmpty && quasiIds.size == names.size,
      "kAnonymityReport: quasiIds and names must align")
    require(k >= 1 && l >= 1, s"kAnonymityReport: bad k=$k l=$l")
    df.groupBy(quasiIds.zip(names).map { case (c, n) => c.alias(n) }: _*)
      .agg(count(lit(1)).alias("n"),
        countDistinct(sensitive).alias("l_distinct"))
      .withColumn("k_anonymous", col("n") >= k)
      .withColumn("l_diverse", col("l_distinct") >= l)
      .orderBy(names.map(col): _*)
  }

  /** Entropy l-diversity — the stronger privacy audit above
    * [[kAnonymityReport]]'s distinct-count check: a QI group passes only
    * if the ENTROPY of its sensitive-value distribution is ≥ ln(l), so a
    * group carrying l distinct values but 99% one of them (skew the
    * distinct count can't see — the attacker still learns the value with
    * high confidence) fails. Per group: n, distinct sensitive count, the
    * entropy H = −Σ p·ln p over exact per-(QI, sensitive) cell counts
    * (term sum through DECIMAL(28,14) — order-proof), the effective
    * l = e^H ("this group is as diverse as eff_l uniform values"), and
    * the ≥ ln(l) verdict. Two aggregations — cells keyed by (QI,
    * sensitive), then groups keyed by QI — both map-side-combining;
    * output is QI-domain-sized. H and eff_l are 6-dp round0 readouts;
    * the verdict compares the UNROUNDED H on both engines. */
  def entropyLDiversityReport(df: DataFrame, quasiIds: Seq[Column],
                              names: Seq[String], sensitive: Column,
                              l: Int): DataFrame = {
    require(quasiIds.nonEmpty && quasiIds.size == names.size,
      "entropyLDiversityReport: quasiIds and names must align")
    require(l >= 1, s"entropyLDiversityReport: bad l=$l")
    val cells = df
      .groupBy(quasiIds.zip(names).map { case (c, n) => c.alias(n) } :+
        sensitive.alias("__s"): _*)
      .agg(count(lit(1)).alias("__c"))
    val tot = cells.groupBy(names.map(col): _*)
      .agg(sum("__c").alias("__n"))
    val p = col("__c").cast("double") / col("__n").cast("double")
    val h = cells.join(tot, names)
      .groupBy(names.map(col): _*)
      .agg(max("__n").alias("n"), count(lit(1)).alias("l_distinct"),
        // p·ln(p) pins to 9 dp before the 14-dp DECIMAL cast (the
        // cross-libm transcendental-output stance)
        (-sum(round(p * log(p), 9).cast("decimal(28,14)")).cast("double"))
          .alias("__h"))
    h.select(names.map(col) ++ Seq(col("n"), col("l_distinct"),
        round0(col("__h"), 6).alias("entropy"),
        round0(exp(col("__h")), 6).alias("effective_l"),
        (col("__h") >= math.log(l.toDouble)).alias("entropy_l_diverse")): _*)
      .orderBy(names.map(col): _*)
  }
}
