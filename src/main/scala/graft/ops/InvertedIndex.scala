package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Inverted positional index over a tokenized text corpus — the
  * retrieval-engine layout that answers term and phrase queries WITHOUT
  * scanning document text: the corpus is pivoted once into token-keyed
  * posting lists, and every subsequent query touches only the postings of
  * its own terms (a pushed-down `token IN (...)` filter against the
  * token-sorted index), never the 100 TB text column. The batch twin of
  * what Lucene/ES do per shard, expressed as two DataFrame shapes.
  */
object InvertedIndex {

  /** Build positional postings: one row per (token, doc) carrying the
    * sorted 0-based positions of that token in that doc, plus its term
    * frequency. ONE shuffle on the (token, doc) pair — position lists
    * assemble with map-side partials; the text column is dropped at the
    * map side and never crosses the wire. Token positions are indices
    * into the whitespace-split sequence BEFORE empty-token filtering, so
    * adjacency in the original text is `pos + 1` (what `phraseSearch`
    * needs). Persist with `sources/Bucketing` bucketed+sorted by token to
    * make every later search shuffle-free on the index side. */
  def buildPostings(docs: DataFrame, idCol: String,
                    textCol: String): DataFrame =
    docs.select(col(idCol).alias("doc_id"),
        posexplode(split(col(textCol), " ")).as(Seq("pos", "token")))
      .filter(col("token") =!= "")
      .groupBy("token", "doc_id")
      .agg(sort_array(collect_list(col("pos"))).alias("positions"),
        count(lit(1)).alias("tf"))

  /** Exact phrase search over positional postings. Token i of the phrase
    * sitting at position p supports a phrase START at p − i; a start
    * supported by ALL phrase slots is a match — so the classic
    * posting-list zig-zag intersection becomes one relational chain:
    * filter postings to the phrase's tokens (a pushable IN predicate —
    * on a token-bucketed index the scan reads only those buckets),
    * broadcast the (token, slot) table of the phrase itself, shift each
    * position by its slot, and count DISTINCT supporting slots per
    * (doc, start). Repeated phrase tokens work because slots, not
    * tokens, must all be present. Aggregation traffic is bounded by the
    * phrase terms' postings — corpus size never appears.
    * Returns (doc_id, n_matches > 0). */
  def phraseSearch(postings: DataFrame, phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phraseSearch: empty phrase")
    val spark = postings.sparkSession
    import spark.implicits._
    val slots = phrase.zipWithIndex.toDF("token", "__slot")
    postings
      .filter(col("token").isin(phrase.distinct: _*))
      .join(broadcast(slots), "token")
      .select(col("doc_id"), col("__slot"),
        explode(col("positions")).alias("__pos"))
      .select(col("doc_id"),
        (col("__pos") - col("__slot")).alias("start"), col("__slot"))
      .filter(col("start") >= 0)
      .groupBy("doc_id", "start")
      .agg(countDistinct(col("__slot")).alias("__nslots"))
      .filter(col("__nslots") === phrase.length)
      .groupBy("doc_id")
      .agg(count(lit(1)).alias("n_matches"))
  }
}
