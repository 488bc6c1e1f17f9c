package graft

import graft.plans.GraftExtensions

/** The SQL surface of the native expressions. */
class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("native expressions are callable from Spark SQL after install") {
    GraftExtensions.install(spark)
    Seq((0L, "the quick brown fox jumps the quick brown fox"))
      .toDF("doc_id", "text").createOrReplaceTempView("ext_docs")
    val r = spark.sql("""
      SELECT
        size(word_shingles(split(text, ' '), 3)) AS n_shingles,
        size(minhash_signature(word_shingles(split(text, ' '), 3), 16)) AS sig_len,
        simhash64(split(text, ' ')) AS sim,
        rolling_hash64(split(text, ' ')) AS rh,
        array_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dot,
        size(sign_sketches(array(1.0d, -1.0d), 2, 4)) AS n_sketches,
        lang_id(split('the cat and the dog is here', ' ')) AS lang,
        count_in_set(split(text, ' '), 'the,fox') AS n_hits
      FROM ext_docs""").head()
    assert(r.getAs[Int]("n_shingles") == 5) // 7 trigrams, 2 repeated
    assert(r.getAs[Int]("sig_len") == 16)
    assert(r.getAs[Long]("rh") != 0L)
    assert(r.getAs[Double]("dot") == 11.0)
    assert(r.getAs[Int]("n_sketches") == 2)
    assert(r.getAs[String]("lang") == "en")
    assert(r.getAs[Long]("n_hits") == 4L) // 'the' x2 + 'fox' x2
  }

  test("SQL results match the Column API") {
    GraftExtensions.install(spark)
    val df = Seq((0L, "alpha beta gamma delta")).toDF("doc_id", "text")
    df.createOrReplaceTempView("ext_docs2")
    val viaSql = spark.sql(
      "SELECT simhash64(split(text, ' ')) AS s FROM ext_docs2").head().getLong(0)
    val viaCol = df.select(graft.llm.Dedup.simhash64(
      graft.llm.TextAnalysis.tokens(org.apache.spark.sql.functions.col("text")))
      .as("s")).head().getLong(0)
    assert(viaSql == viaCol)
  }
}
