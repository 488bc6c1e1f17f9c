package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._
import graft.operators.Skew

/** End-to-end skew evidence for the salted join: on a key where one
  * value holds ~30% of the rows, the plain sort-merge join concentrates
  * that key's rows in one task, while the salted join spreads them so no
  * task's shuffle read exceeds 2× the stage mean — the property that
  * keeps a hot key from OOMing one executor at 100 TB.
  */
class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  /** Per-stage shuffle-read record counts per task. */
  private final class ShuffleReadListener extends SparkListener {
    val byStage = new scala.collection.concurrent.TrieMap[Int, Vector[Long]]()
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val recs = Option(t.taskMetrics)
        .map(_.shuffleReadMetrics.recordsRead).getOrElse(0L)
      byStage.updateWith(t.stageId)(v => Some(v.getOrElse(Vector.empty) :+ recs))
    }
  }

  /** max/mean shuffle-read imbalance of the heaviest shuffle-read stage
    * while running `job`, with AQE coalescing/skew-handling off so the
    * raw distribution (not AQE's repair of it) is what's measured. */
  private def imbalanceOf(job: => Unit): Double = {
    val listener = new ShuffleReadListener
    spark.sparkContext.addSparkListener(listener)
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      job
      // listener bus is async: wait for the task events to drain
      var tries = 0
      while (listener.byStage.isEmpty && tries < 50) {
        Thread.sleep(100); tries += 1
      }
      Thread.sleep(500)
      val stages = listener.byStage.readOnlySnapshot().values
        .filter(_.map(_.toDouble).sum > 0)
      assert(stages.nonEmpty, "no shuffle-read stage observed")
      val tasks = stages.maxBy(_.map(_.toDouble).sum)
      val nonEmpty = tasks.filter(_ > 0)
      nonEmpty.max.toDouble * nonEmpty.size / nonEmpty.map(_.toDouble).sum
    } finally {
      spark.sparkContext.removeSparkListener(listener)
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }

  // key 0 holds 30% of 200k rows; 96 other keys share the rest
  private def fact = spark.range(200000).select(
    when(col("id") % 10 < 3, lit(0L)).otherwise(pmod(col("id"), lit(97L)))
      .as("key"),
    col("id").as("v"))
  private def dim = spark.range(0, 97).select(col("id").as("key"),
    (col("id") * 7).as("dim_val"))

  test("plain shuffle join concentrates the hot key; salted join does not") {
    val plain = imbalanceOf {
      fact.join(dim, Seq("key")).groupBy("key").count()
        .write.format("noop").mode("overwrite").save()
    }
    val salted = imbalanceOf {
      Skew.saltedJoin(fact, dim, "key", saltFactor = 16)
        .groupBy("key").count()
        .write.format("noop").mode("overwrite").save()
    }
    // the hot key is ~30% of rows over 8 test cores/partitions: plain
    // puts 30% in one task (~2.4x an 8-task mean); salted spreads it
    assert(plain > 2.0, f"plain join unexpectedly balanced: $plain%.2f")
    assert(salted <= 2.0, f"salted join still skewed: $salted%.2f")
  }

  test("saltedJoin preserves inner-join multiplicity on the skewed key") {
    val out = Skew.saltedJoin(fact, dim, "key", saltFactor = 16)
    assert(out.count() == 200000L)
    val hot = out.filter(col("key") === 0).count()
    assert(hot == fact.filter(col("key") === 0).count())
  }
}
