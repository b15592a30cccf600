package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.BloomMightContainExpr

/** Bloom-filter join pruning: build a compact membership sketch of the
  * dimension side's join keys, then drop fact rows that cannot match
  * BEFORE the join shuffle. On a 100 TB fact table with a selective
  * dimension, the shuffle (or even the scan, since the filter sits right
  * above it and runs inside codegen) carries only the candidate rows —
  * the classic semi-join reduction, paid for with a broadcast-sized
  * artifact instead of a full shuffle of the dim keys to every fact
  * partition.
  *
  * Sizing: a Bloom filter needs ~1.44·log2(1/fpp) bits per distinct key —
  * at 1% fpp that is ~9.6 bits/key, so 100 M dimension keys ≈ 115 MiB.
  * Choose `expectedItems` ≥ the true distinct count (an undersized filter
  * degrades fpp, never correctness) and trade fpp against broadcast
  * budget. Spark's own runtime bloom join (injected by the optimizer)
  * covers the single-query automatic case; this operator is the explicit
  * artifact — build once, reuse across many scans (e.g. prune each daily
  * fact increment against a slowly-changing dimension).
  *
  * Correctness: no false negatives by construction; false positives are
  * eliminated by the real join that follows, so `prunedInnerJoin` is
  * value-identical to the plain inner join (oracle-checked by
  * q_bloom_prune_join; equivalence + pruning-effect spec in
  * BloomPruneSpec).
  *
  * Keys of any type are normalized through xxhash64 on BOTH sides, so
  * the filter always stores longs and the probe stays a primitive
  * codegen call (`BloomMightContainExpr`).
  */
object BloomPrune {

  /** Build the serialized filter over `xxhash64(key)` of the dim side.
    * The build is distributed — per-partition filters OR-merged up a tree,
    * only the finished ~KB-to-MB artifact lands on the driver (same
    * pattern as the k-means centroid model artifact). Built directly on
    * the public sketch API rather than `df.stat.bloomFilter`, which NPEs
    * on an empty build side in Spark 4.1 — an EMPTY dimension must yield
    * an empty filter that prunes everything, which is the correct join
    * result. */
  def buildKeyBloom(dim: DataFrame, key: String,
                    expectedItems: Long, fpp: Double): Array[Byte] = {
    import org.apache.spark.util.sketch.BloomFilter
    val bloom = dim.select(xxhash64(col(key)).alias("__h"))
      .rdd.treeAggregate(BloomFilter.create(expectedItems, fpp))(
        (f, row) => { f.putLong(row.getLong(0)); f },
        (a, b) => { a.mergeInPlace(b); a })
    BloomMightContainExpr.serialize(bloom)
  }

  /** Fact-side pruning predicate for a previously built filter. */
  def mightMatch(factKey: Column, bloomBytes: Array[Byte]): Column =
    BloomMightContainExpr(xxhash64(factKey), bloomBytes)

  /** Inner equi-join with the fact side pre-pruned by the dim-key bloom.
    * Value-identical to `fact.join(dim, fact(factKey) === dim(dimKey))`. */
  def prunedInnerJoin(fact: DataFrame, factKey: String,
                      dim: DataFrame, dimKey: String,
                      expectedItems: Long = 1000000L,
                      fpp: Double = 0.01): DataFrame = {
    val bloom = buildKeyBloom(dim, dimKey, expectedItems, fpp)
    fact.filter(mightMatch(col(factKey), bloom))
      .join(dim, col(factKey) === dim(dimKey))
  }
}
