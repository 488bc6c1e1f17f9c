package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.expr._

/** SQL surface for the engine's native expressions.
  *
  * Register cluster-wide via
  *   spark.sql.extensions=graft.plans.GraftExtensions
  * (or `.withExtensions(new GraftExtensions)`), or per-session with
  * [[GraftExtensions.install]]. Afterwards plain Spark SQL can call:
  *
  *   word_shingles(tokens, n)           → array<string>
  *   minhash_signature(shingles, k)     → array<long>
  *   simhash64(tokens)                  → long
  *   rolling_hash64(tokens)             → long
  *   array_dot(a, b)                    → double
  *   sign_sketches(vec, tables, bits)   → array<long>
  *   lang_id(tokens)                    → string
  *   count_in_set(tokens, 'a,b,c')      → long
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.builders.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.expr", name), builder))
    }
}

object GraftExtensions {

  private def intArg(e: Expression, what: String): Int = {
    require(e.foldable, s"$what must be an integer literal, got ${e.sql}")
    e.eval() match {
      case n: Number => n.intValue()
      case other => sys.error(s"$what must be an integer literal, got $other")
    }
  }

  private def arity(es: Seq[Expression], n: Int, name: String): Unit =
    require(es.length == n, s"$name expects $n arguments, got ${es.length}")

  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "word_shingles" -> (es => { arity(es, 2, "word_shingles")
      WordShingles(es(0), intArg(es(1), "n")) }),
    "minhash_signature" -> (es => { arity(es, 2, "minhash_signature")
      MinHashSignature(es(0), intArg(es(1), "k")) }),
    "simhash64" -> (es => { arity(es, 1, "simhash64"); SimHash64(es(0)) }),
    "rolling_hash64" -> (es => { arity(es, 1, "rolling_hash64")
      RollingHash64(es(0)) }),
    "array_dot" -> (es => { arity(es, 2, "array_dot"); ArrayDot(es(0), es(1)) }),
    "sign_sketches" -> (es => { arity(es, 3, "sign_sketches")
      SignSketches(es(0), intArg(es(1), "nTables"), intArg(es(2), "nBits")) }),
    "lang_id" -> (es => { arity(es, 1, "lang_id")
      LangId(es(0), graft.llm.TextAnalysis.LangProfiles) }),
    "count_in_set" -> (es => { arity(es, 2, "count_in_set")
      require(es(1).foldable, s"count_in_set values must be a string literal")
      val values = String.valueOf(es(1).eval()).split(",").toSeq
      CountInSet(es(0), values) }))

  /** Register into an already-running session (tests, notebooks). */
  def install(spark: SparkSession): Unit =
    builders.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }
}
