package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.MoviesEtl
import graft.sources.IO

/** Integration test: the full reference pipeline (challenge2.py:13-301)
  * over miniature reference-shaped fixtures (FIXTURES.md §2), asserting
  * the scaled-down checkpoint counts the reference printed
  * (7,311 → 7,076 → 7,033 analog) and the conflict-resolution semantics.
  */
class MoviesEtlSpec extends AnyFunSuite with SparkSpec {

  private def res(name: String): String =
    getClass.getResource(s"/movies-etl/$name").getPath

  private lazy val wiki: DataFrame =
    IO.readJsonArray(spark, res("wiki_movies.json"))
  private lazy val kaggle: DataFrame =
    IO.readCsvInferred(spark, res("movies_metadata.csv"))
  private lazy val ratings: DataFrame =
    IO.readCsvInferred(spark, res("ratings.csv"))

  test("extract: raw record counts") {
    assert(wiki.count() == 11)
    assert(kaggle.count() == 10)
    assert(ratings.count() == 20)
  }

  test("wiki branch checkpoints: filter → dedup → prune") {
    val cleaned = MoviesEtl.cleanWiki(wiki)
    // 11 raw − 1 TV show (No. of episodes) − 1 missing imdb_link = 9
    // − 1 duplicate imdb_id (keep-first on url) = 8
    assert(cleaned.count() == 8)
    // keep-first kept Delta (url asc), not Delta_Redux
    val delta = cleaned.filter(col("imdb_id") === "tt0000004")
    assert(delta.select("title").head().getString(0) == "Delta")
    // the all-null-after-filter TV column was pruned
    assert(!cleaned.columns.contains("No. of episodes"))
  }

  test("wiki branch parsing: money / date / runtime forms") {
    val byId = MoviesEtl.cleanWiki(wiki)
      .select("imdb_id", "box_office", "budget_wiki", "release_date_wiki", "running_time_wiki")
      .collect().map(r => r.getString(0) -> r).toMap
    val alpha = byId("tt0000001")
    assert(alpha.getDouble(1) == 2.14e7 && alpha.getDouble(2) == 1.1e7)
    assert(alpha.getDate(3).toString == "1990-01-15" && alpha.getDouble(4) == 102.0)
    val beta = byId("tt0000002")
    assert(beta.getDouble(1) == 1.2e9 && beta.getDouble(2) == 2e8 && beta.getDouble(4) == 135.0)
    val gamma = byId("tt0000003") // "millon" typo + period separators
    assert(gamma.getDouble(1) == 5.5e6 && gamma.getDouble(2) == 3e6)
    val delta = byId("tt0000004") // range + citation + "1 h 40 m"
    assert(delta.getDouble(1) == 1.5e7 && delta.getDouble(2) == 7.5e6 && delta.getDouble(4) == 100.0)
    val eps = byId("tt0000005") // unparseable money → null
    assert(eps.isNullAt(1) && eps.isNullAt(2))
  }

  test("kaggle branch: adult/corrupt filtering and coercions") {
    val k = MoviesEtl.cleanKaggle(kaggle)
    assert(k.count() == 8) // 10 − adult=True − corrupt prose row
    assert(!k.columns.contains("adult"))
    val kappa = k.filter(col("imdb_id") === "tt0000009").head()
    assert(kappa.getAs[Boolean]("video"))
  }

  test("join + anomaly purge + conflict resolution") {
    val movies = MoviesEtl.joinMovies(MoviesEtl.cleanWiki(wiki), MoviesEtl.cleanKaggle(kaggle))
    // wiki∩kaggle imdb_ids = {tt1..tt6, tt9} = 7; Delta purged (wiki 1997 vs kaggle 1960) = 6
    assert(movies.count() == 6)
    assert(movies.filter(col("imdb_id") === "tt0000004").count() == 0)
    // Beta had kaggle zeros → filled from wiki (E8/J2)
    val beta = movies.filter(col("imdb_id") === "tt0000002").head()
    assert(beta.getAs[Double]("runtime") == 135.0)
    assert(beta.getAs[Double]("budget") == 2e8) // long column promoted by the double-typed fill
    assert(beta.getAs[Double]("revenue") == 1.2e9)
    // Alpha had complete kaggle data → kaggle values kept
    val alpha = movies.filter(col("imdb_id") === "tt0000001").head()
    assert(alpha.getAs[Double]("runtime") == 102.0)
  }

  test("full pipeline: rating counts pivoted, missing levels filled with 0") {
    val out = MoviesEtl.run(wiki, kaggle, ratings)
    assert(out.count() == 6)
    val alpha = out.filter(col("imdb_id") === "tt0000001").head()
    assert(alpha.getAs[Long]("rating_4_0") == 2L) // users 1 and 3
    assert(alpha.getAs[Long]("rating_0_5") == 1L) // user 5
    assert(alpha.getAs[Long]("rating_3_0") == 0L) // no such rating → filled 0
    // Epsilon (kaggle_id 105): one 3.0 rating
    val eps = out.filter(col("imdb_id") === "tt0000005").head()
    assert(eps.getAs[Long]("rating_3_0") == 1L)
    // Gamma (103): ratings 2.0 and 3.0
    val gamma = out.filter(col("imdb_id") === "tt0000003").head()
    assert(gamma.getAs[Long]("rating_2_0") == 1L && gamma.getAs[Long]("rating_3_0") == 1L)
  }
}
