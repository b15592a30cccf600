package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops._

/** The reference's complete ETL (challenge2.py:13-301) as a pure
  * DataFrame-composition pipeline — SURVEY.md §3.1. Each stage is a
  * `DataFrame => DataFrame`; nothing materializes until the caller sinks.
  *
  * Inputs (see graft.sources.IO): wiki — multiline JSON array, ragged keys;
  * kaggle — movies_metadata.csv; ratings — userId/movieId/rating/timestamp.
  */
object MoviesEtl {

  /** The 20 alt-title language keys folded into one map column
    * (challenge2.py:32-38). */
  val AltTitleKeys: Seq[String] = Seq(
    "Also known as", "Arabic", "Cantonese", "Chinese", "French", "Hangul",
    "Hebrew", "Hepburn", "Japanese", "Literally", "Mandarin", "McCune-Reischauer",
    "Original title", "Polish", "Revised Romanization", "Romanized",
    "Russian", "Simplified", "Traditional", "Yiddish")

  /** Synonym-column consolidation map (challenge2.py:44-65): canonical
    * column → variant spellings. Applied as coalesce + drop (F2). */
  val SynonymMap: Map[String, Seq[String]] = Map(
    "Director" -> Seq("Directed by"),
    "Country" -> Seq("Country of origin"),
    "Distributor" -> Seq("Distributed by"),
    "Editor(s)" -> Seq("Edited by"),
    "Composer(s)" -> Seq("Music by", "Musiccomposer"),
    "Producer(s)" -> Seq("Producer", "Produced by", "Producers"),
    "Production company(s)" -> Seq("Production company", "Production companies", "Productioncompanies", "Productioncompany", "Productioncompany "),
    "Writer(s)" -> Seq("Written by", "Screen story by", "Screenplay by", "Story by", "Adaptation by"),
    "Original release" -> Seq("Release Date", "Released"),
    "Release date" -> Seq("Original release"),
    "Running time" -> Seq("Length"),
    "Theme music composer" -> Seq("Theme music by"))

  /** Wiki branch: movie filter → clean_movie → imdb_id extract → keep-first
    * dedup → null-column pruning → scalar parsing
    * (challenge2.py:21-200). `orderCol` pins keep-first determinism (J1). */
  def cleanWiki(wiki: DataFrame, orderCol: String = "url"): DataFrame = {
    // B1 — keep movies: a director variant present, imdb_link present, not a TV show
    val movies = Filters.existence(
      Filters.anyExistence(wiki, Seq("Director", "Directed by")
        .filter(wiki.columns.contains)),
      Seq("imdb_link"),
      Seq("No. of episodes").filter(wiki.columns.contains))
    // F1/F2 — clean_movie
    val altDone = Cleaning.consolidateToMap(movies, AltTitleKeys, "alt_titles")
    val merged = Cleaning.mergeSynonyms(altDone, SynonymMap)
    // C1/C2 — imdb_id + keep-first dedup
    val withId = Dedup.extractKey(merged, "imdb_link", "imdb_id", "(tt\\d{7})")
    val deduped = Dedup.keepFirst(withId.filter(col("imdb_id").isNotNull),
      Seq("imdb_id"), Seq(col(orderCol).asc))
    // C4 — <90%-null column survivors
    val pruned = Dedup.pruneMostlyNullColumns(deduped, 0.9)
    // D/E — scalar parsing (list-typed cells already joined by caller or ingest)
    val parsed = pruned
      .withColumn("box_office", parseIfPresent(pruned, "Box office"))
      .withColumn("budget_wiki", parseIfPresent(pruned, "Budget"))
      .withColumn("release_date_wiki", dateIfPresent(pruned, "Release date"))
      .withColumn("running_time_wiki", runtimeIfPresent(pruned, "Running time"))
    parsed.drop("Box office", "Budget", "Release date", "Running time")
  }

  private def asText(df: DataFrame, c: String): Column = df.schema(c).dataType match {
    case org.apache.spark.sql.types.ArrayType(_, _) => concat_ws(" ", col(c)) // D5
    case _ => col(c).cast("string")
  }
  private def parseIfPresent(df: DataFrame, c: String): Column =
    if (df.columns.contains(c)) TextParse.parseDollars(asText(df, c))
    else lit(null).cast("double")
  private def dateIfPresent(df: DataFrame, c: String): Column =
    if (df.columns.contains(c))
      DatesNums.parseDateMulti(TextParse.extract(asText(df, c),
        "(\\w+ \\d{1,2}, \\d{4}|\\d{4}-\\d{2}-\\d{2}|\\w+ \\d{4}|\\d{4})", 1))
    else lit(null).cast("date")
  private def runtimeIfPresent(df: DataFrame, c: String): Column =
    if (df.columns.contains(c)) TextParse.parseRuntimeMinutes(asText(df, c))
    else lit(null).cast("double")

  /** Kaggle branch (challenge2.py:202-212): drop adult rows + corrupt adult
    * values, boolean video, numeric coercions, ISO release_date. */
  def cleanKaggle(kaggle: DataFrame): DataFrame =
    kaggle
      .filter(col("adult") === "False").drop("adult") // B3 (also drops the 3 corrupt rows)
      .withColumn("video", DatesNums.boolFromString(col("video"))) // E7
      .withColumn("budget", col("budget").cast("long")) // E5
      .withColumn("id", col("id").cast("long"))
      .withColumn("popularity", col("popularity").cast("double"))
      .withColumn("release_date", to_date(col("release_date"), "yyyy-MM-dd")) // E2
      .withColumn("runtime", col("runtime").cast("double"))
      .withColumn("revenue", col("revenue").cast("double"))

  /** Ratings branch (challenge2.py:214): epoch seconds → timestamp. */
  def transformRatings(ratings: DataFrame): DataFrame =
    ratings.withColumn("ts", DatesNums.epochToTimestamp(col("timestamp")))
      .drop("timestamp")

  /** Join + conflict resolution (challenge2.py:216-243): inner join on
    * imdb_id with suffixes, anomaly purge, zero-aware gap fills per the
    * notebook's ASSUMPTION cells (keep kaggle titles/dates; fill zeros from
    * wiki — challenge.ipynb cells 52-74). */
  def joinMovies(wiki: DataFrame, kaggle: DataFrame): DataFrame = {
    val joined = Joins.innerWithSuffixes(wiki, kaggle, Seq("imdb_id"), "_wiki", "_kaggle")
    // G3 — the >1996-wiki / <1965-kaggle mis-merge purge (challenge2.py:229-231).
    // Kaggle's date column is `release_date`; wiki's parsed one is
    // `release_date_wiki` (no name collision, so no suffixing happened).
    val purged = Joins.purge(joined,
      col("release_date_wiki") > to_date(lit("1996-01-01")) &&
        col("release_date") < to_date(lit("1965-01-01")))
    purged
      .withColumn("runtime",
        DatesNums.fillZeroFrom(col("runtime"), col("running_time_wiki"))) // E8
      .withColumn("budget",
        DatesNums.fillZeroFrom(col("budget"), col("budget_wiki")))
      .withColumn("revenue",
        DatesNums.fillZeroFrom(col("revenue"), col("box_office")))
      .drop("running_time_wiki", "budget_wiki", "box_office", "release_date_wiki")
  }

  /** Rating-counts chain (challenge2.py:273-281): groupby-count → pivot
    * over the EXPLICIT rating grid (J6) → rating_* rename → left join →
    * fill 0. */
  val RatingLevels: Seq[String] =
    Seq("0.5", "1.0", "1.5", "2.0", "2.5", "3.0", "3.5", "4.0", "4.5", "5.0")

  def ratingCounts(ratings: DataFrame): DataFrame =
    Aggregates.pivotCounts(
      ratings.withColumn("rating", format_number(col("rating"), 1)),
      "movieId", "rating", RatingLevels, "rating_")

  def withRatingCounts(movies: DataFrame, ratings: DataFrame,
                       movieIdCol: String = "kaggle_id"): DataFrame = {
    val counts = ratingCounts(ratings)
    val ratingCols = RatingLevels.map(l => "rating_" + Aggregates.sanitize(l))
    val joined = movies.join(counts, movies(movieIdCol) === counts("movieId"), "left")
      .drop("movieId")
    joined.na.fill(0L, ratingCols) // E9
  }

  /** End-to-end: the §3.1 composition. */
  def run(wiki: DataFrame, kaggle: DataFrame, ratings: DataFrame): DataFrame = {
    val movies = joinMovies(cleanWiki(wiki), cleanKaggle(kaggle))
      .withColumnRenamed("id", "kaggle_id")
    withRatingCounts(movies, transformRatings(ratings))
  }
}
