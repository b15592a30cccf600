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
}
