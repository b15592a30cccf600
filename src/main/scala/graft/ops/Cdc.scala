package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CDC (change-data-capture) apply: fold a batch of row-level changes —
  * inserts, updates, deletes — into a snapshot, producing the next
  * snapshot. The MERGE INTO shape every lakehouse table format exposes,
  * re-expressed as a plain plan: collapse the batch to its latest change
  * per key, anti-join the snapshot against touched keys, union the
  * surviving inserts/updates back in.
  *
  * Scale shape: one window over the (small) change batch, one key
  * shuffle of snapshot vs batch for the anti-join (broadcast when the
  * batch is broadcast-sized — the common case), one union. Snapshot rows
  * for untouched keys stream through the anti-join unmodified; nothing
  * is rewritten per-row. With the snapshot bucketed on the key the
  * anti-join's snapshot side carries no exchange at all
  * (sources/Bucketing).
  */
object Cdc {

  /** Apply `changes` to `snapshot`.
    *
    * `changes` carries the snapshot's columns plus `opCol` ∈
    * {"I","U","D"} and is collapsed to the LATEST change per key first
    * (by `ts`, tie-broken by `tieBreak` — so replaying an out-of-order
    * or duplicated feed is safe and deterministic). Insert-vs-update is
    * deliberately not distinguished beyond delete-or-not: an I on an
    * existing key and a U on an absent key both converge to upsert
    * semantics, which is what makes replays idempotent. */
  def applyCdc(snapshot: DataFrame, changes: DataFrame, key: String,
               opCol: String, ts: String, tieBreak: String): DataFrame = {
    val w = Window.partitionBy(key).orderBy(col(ts).desc, col(tieBreak).desc)
    val latest = changes
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
    val untouched = snapshot.join(latest.select(col(key)), Seq(key), "left_anti")
    val upserts = latest.filter(col(opCol) =!= "D")
      .select(snapshot.columns.map(col): _*)
    untouched.unionByName(upserts)
  }

  /** The inverse of `applyCdc`: diff two snapshots into the minimal
    * I/U/D change feed that transforms the old into the new —
    * `applyCdc(old, extractCdc(old, new) …) == new` is the round-trip
    * law (spec-checked). This is how a feed is DERIVED when the upstream
    * only ships full snapshots: inserts carry the new payload, updates
    * the new payload (any column differing under null-safe equality),
    * deletes the old payload for auditability; unchanged keys are
    * filtered out so downstream cost scales with the delta, not the
    * table. One full-outer key join; both sides ship their payloads once.
    * Schemas must match; `key` must be unique per side (snapshot
    * semantics). */
  def extractCdc(oldSnap: DataFrame, newSnap: DataFrame, key: String): DataFrame = {
    require(oldSnap.columns.sameElements(newSnap.columns),
      s"extractCdc: schemas differ: ${oldSnap.columns.mkString(",")} vs " +
        newSnap.columns.mkString(","))
    val payload = oldSnap.columns.filterNot(_ == key)
    val o = oldSnap.select(col(key) +: lit(1).alias("__in_o") +:
      payload.map(c => col(c).alias("__o_" + c)): _*)
    val n = newSnap.select(col(key) +: lit(1).alias("__in_n") +:
      payload.map(c => col(c).alias("__n_" + c)): _*)
    val changed = payload.map(c => !(col("__o_" + c) <=> col("__n_" + c)))
      .reduceOption(_ || _).getOrElse(lit(false))
    o.join(n, Seq(key), "full_outer")
      .withColumn("op",
        when(col("__in_o").isNull, "I")
          .when(col("__in_n").isNull, "D")
          .when(changed, "U"))
      .filter(col("op").isNotNull)
      .select(col(key) +: payload.map(c =>
        when(col("op") === "D", col("__o_" + c))
          .otherwise(col("__n_" + c)).alias(c)) :+ col("op"): _*)
  }
}
