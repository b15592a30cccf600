package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.IO

/** Hive-style partitioned layout must (a) lay files out one directory per
  * partition value, (b) prune non-matching partitions at PLANNING time — a
  * filter on the partition column becomes a PartitionFilter on the scan and
  * only the matching directories' files are listed — and (c) round-trip
  * values identically. This is the coarse pruning layer a 100 TB table
  * relies on before any row-group statistics apply. */
class PartitionedLayoutSpec extends AnyFunSuite with SparkSpec
    with AdaptiveSparkPlanHelper {

  test("compacted write bounds the output file count; values survive") {
    val dir = java.nio.file.Files.createTempDirectory("graft-compact").toString
    try {
      val docs = Tables.documents(spark, sf0).select("doc_id", "text")
      IO.writeCompacted(docs, dir, numFiles = 2)
      val files = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet"))
      assert(files.length == 2, s"expected 2 files, got ${files.map(_.getName).toSeq}")
      assert(spark.read.parquet(dir).count() == docs.count())
    } finally rmTree(dir)
  }

  test("writeShards: one file per shard dir, file order is pos order") {
    import graft.ops.Pack
    val dir = java.nio.file.Files.createTempDirectory("graft-shards").toString
    try {
      val docs = Tables.documents(spark, sf0).select("doc_id", "text")
      Pack.writeShards(docs, "doc_id", numShards = 4, dir)
      val shardDirs = new java.io.File(dir).listFiles()
        .filter(_.getName.startsWith("shard=")).sortBy(_.getName)
      assert(shardDirs.length == 4, s"got ${shardDirs.map(_.getName).toSeq}")
      shardDirs.foreach { sd =>
        val files = sd.listFiles().filter(_.getName.endsWith(".parquet"))
        assert(files.length == 1, s"${sd.getName}: ${files.length} files")
        // single-file parquet read preserves write order → pos must ascend
        val pos = spark.read.parquet(files.head.getPath)
          .select("pos").collect().map(_.getLong(0)).toSeq
        assert(pos == (1L to pos.length).toSeq, s"${sd.getName} not in pos order")
      }
      // round-trip: every doc lands in the shard its manifest assigned
      val manifest = Pack.shardManifest(docs, "doc_id", 4)
        .select(col("doc_id"), col("shard")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val back = spark.read.parquet(dir)
        .select(col("doc_id"), col("shard").cast("long")).collect()
      assert(back.length == manifest.size)
      back.foreach(r => assert(manifest(r.getLong(0)) == r.getLong(1)))
    } finally rmTree(dir)
  }

  test("mergeSchema read unions schemas across parquet batches") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-evolve").toString
    try {
      // batch 1: (id, a); batch 2 adds column b — the evolution boundary
      Seq((1L, "x")).toDF("id", "a").write.parquet(dir + "/b1")
      Seq((2L, "y", 9.5)).toDF("id", "a", "b").write.parquet(dir + "/b2")
      val merged = IO.readParquetMergedSchema(spark, dir + "/*")
      assert(merged.columns.sorted.toSeq == Seq("a", "b", "id"))
      val rows = merged.orderBy("id").collect()
      assert(rows.length == 2)
      assert(rows(0).isNullAt(rows(0).fieldIndex("b")), "old file's new column must be null")
      assert(rows(1).getDouble(rows(1).fieldIndex("b")) == 9.5)
    } finally rmTree(dir)
  }

  private def rmTree(dir: String): Unit = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(java.nio.file.Paths.get(dir)).iterator().asScala
      .toSeq.sortBy(-_.getNameCount).foreach(java.nio.file.Files.deleteIfExists(_))
  }

  test("partitionBy lays out directories and prunes at planning time") {
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    try {
      val docs = Tables.documents(spark, sf0)
        .select("doc_id", "text", "lang", "source")
      IO.writePartitioned(docs, dir, Seq("lang"))

      // (a) physical layout: one subdirectory per language value
      val subdirs = new java.io.File(dir).listFiles()
        .filter(_.isDirectory).map(_.getName).toSet
      val langs = docs.select("lang").na.drop().distinct()
        .collect().map(r => "lang=" + r.getString(0)).toSet
      assert(langs.subsetOf(subdirs), s"missing partition dirs: ${langs -- subdirs}")

      // (b) planning-time pruning: the lang filter must land in the scan's
      // partition filters, and the scan must read only that partition's files
      val q = spark.read.parquet(dir).filter(col("lang") === "en")
      q.write.format("noop").mode("overwrite").save()
      val scans = collectWithSubqueries(q.queryExecution.executedPlan) {
        case s: FileSourceScanExec => s
      }
      assert(scans.nonEmpty, "expected a FileSourceScanExec")
      val scan = scans.head
      assert(scan.partitionFilters.exists(_.references.exists(_.name == "lang")),
        s"lang filter not pushed to partitionFilters: ${scan.partitionFilters}")
      val readFiles = scan.relation.location.listFiles(
        scan.partitionFilters, scan.dataFilters)
        .flatMap(_.files).map(_.getPath.toString)
      assert(readFiles.nonEmpty && readFiles.forall(_.contains("lang=en")),
        s"scan lists files outside lang=en: ${readFiles.filterNot(_.contains("lang=en"))}")

      // (c) value round-trip (partition column is reconstructed from the path)
      val expect = docs.filter(col("lang") === "en")
        .select("doc_id", "text", "source").orderBy("doc_id").collect().toSeq
      val got = q.select("doc_id", "text", "source").orderBy("doc_id").collect().toSeq
      assert(got === expect)
    } finally rmTree(dir)
  }

  test("dynamic partition pruning: dim filter prunes the fact scan at runtime") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-dpp").toString
    try {
      val docs = Tables.documents(spark, sf0)
        .select("doc_id", "text", "lang", "source")
      IO.writePartitioned(docs, dir, Seq("lang"))
      val allFiles = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .filter(p => p.toString.endsWith(".parquet")).count()

      // The dim's selective predicate is on a NON-partition column, so the
      // fact-side partition filter cannot be derived statically: only at
      // runtime, from the dim join keys, can Spark know which lang
      // directories matter. That runtime-injected filter IS dynamic
      // partition pruning — at 100 TB it is the difference between
      // scanning one date/lang directory and scanning the whole table
      // whenever the restriction arrives through a join instead of a
      // literal. Two preconditions the rule checks, encoded here:
      // the dim must be a FILE relation (a local Seq gets constant-folded
      // into a LocalRelation, erasing the Filter node the rule looks
      // for), and the predicate must be a comparison — a bare boolean
      // column does not register as "likely selective".
      Seq(("en", "keep"), ("de", "drop"), ("fr", "drop"))
        .toDF("lang_key", "category")
        .write.mode("overwrite").parquet(dir + "_dim")
      val dim = spark.read.parquet(dir + "_dim")
      val fact = spark.read.parquet(dir)
      val joined = fact.join(dim.filter(col("category") === "keep"),
        fact("lang") === dim("lang_key"))

      val expected = docs.filter(col("lang") === "en").count()
      assert(joined.collect().length == expected)

      val scans = collectWithSubqueries(joined.queryExecution.executedPlan) {
        case s: FileSourceScanExec if s.relation.location.rootPaths
          .exists(_.toString.contains("graft-dpp")) => s
      }
      assert(scans.nonEmpty, "expected a scan over the partitioned fact")
      val scan = scans.head
      assert(scan.partitionFilters.exists(
        _.exists(_.isInstanceOf[org.apache.spark.sql.catalyst.expressions.DynamicPruningExpression])),
        s"no DynamicPruningExpression in partitionFilters: ${scan.partitionFilters}")
      // and the pruning is real: the executed scan read only lang=en's files
      val numFiles = scan.metrics("numFiles").value
      val enFiles = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .filter(p => p.toString.contains("lang=en") && p.toString.endsWith(".parquet"))
        .count()
      assert(numFiles == enFiles && numFiles < allFiles,
        s"scan read $numFiles files; lang=en has $enFiles of $allFiles total")
    } finally { rmTree(dir); rmTree(dir + "_dim") }
  }

  test("forgetKeys deletes tombstoned rows, touching only affected partitions") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-forget").toString
    try {
      val docs = Tables.documents(spark, sf0)
        .select("doc_id", "text", "lang", "source")
      IO.writePartitioned(docs, dir, Seq("lang"))
      val langs = docs.select("lang").distinct().as[String].collect().sorted
      assert(langs.length >= 2, "fixture needs >=2 langs for this test")
      val target = langs.head     // partition we delete FROM
      val witness = langs.last    // partition that must stay untouched
      def partFiles(lang: String) =
        new java.io.File(s"$dir/lang=$lang").listFiles()
          .filter(_.getName.endsWith(".parquet"))
          .map(f => (f.getName, f.lastModified, f.length)).toSeq.sorted
      val witnessBefore = partFiles(witness)
      val total = docs.count()

      // tombstone 3 doc_ids that live in the target partition only
      val victims = docs.filter(col("lang") === target)
        .select("doc_id").orderBy("doc_id").limit(3)
      val victimIds = victims.as[Long].collect().toSeq
      val (deleted, rewritten, removed) =
        IO.forgetKeys(spark, dir, "doc_id", victims, "lang")
      assert(deleted == 3L && rewritten == 1L && removed == 0L,
        s"(deleted=$deleted rewritten=$rewritten removed=$removed)")
      val after = spark.read.parquet(dir)
      assert(after.count() == total - 3)
      assert(after.filter(col("doc_id").isInCollection(victimIds)).count() == 0)
      // the witness partition's files are bit-identical — never rewritten
      assert(partFiles(witness) == witnessBefore,
        "untouched partition was rewritten")
      // no staging residue
      assert(!new java.io.File(dir + ".__forget_staging").exists())

      // wipe EVERY row of the witness partition → its directory is removed
      val all = spark.read.parquet(dir).filter(col("lang") === witness)
        .select("doc_id")
      val n = all.count()
      val (d2, r2, rm2) = IO.forgetKeys(spark, dir, "doc_id", all, "lang")
      assert(d2 == n && rm2 == 1L, s"(d2=$d2 r2=$r2 rm2=$rm2)")
      assert(!new java.io.File(s"$dir/lang=$witness").exists())
      assert(spark.read.parquet(dir).filter(col("lang") === witness).count() == 0)

      // no-op: tombstones matching nothing return zeros and write nothing
      val ghost = Seq(-1L, -2L).toDF("doc_id")
      assert(IO.forgetKeys(spark, dir, "doc_id", ghost, "lang") == ((0L, 0L, 0L)))
    } finally rmTree(dir)
  }
}
