package graft.text

import org.apache.spark.sql.SparkSession

/** Session-scoped user stopword list (reference `set_user_stopwords` /
  * `get_user_stopwords`, lantern_extras/src/stemmers.rs:24-63 — the
  * reference persists a custom stopword file that REPLACES the
  * dictionary's default list).
  *
  * Stored in the session's runtime conf so it survives across queries
  * in the session and is visible to anything that plans against it;
  * expressions capture the list at plan time
  * (graft.functions.text_to_stem_array_user).
  */
object UserStopwords {
  val ConfKey = "graft.text.userStopwords"

  def set(spark: SparkSession, words: Seq[String]): Unit =
    spark.conf.set(ConfKey, words.mkString(","))

  def get(spark: SparkSession): Seq[String] =
    spark.conf.getOption(ConfKey)
      .map(_.split(",").toSeq.filter(_.nonEmpty))
      .getOrElse(Stemmer.stopWords.toSeq.sorted)

  def clear(spark: SparkSession): Unit = spark.conf.unset(ConfKey)

  /** Column with the current user list applied (post-stem drop). */
  def stemArray(spark: SparkSession,
      c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    graft.functions.text_to_stem_array_user(c, get(spark))
}
