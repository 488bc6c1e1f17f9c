package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.plans.logical.Join
import graft.operators.Joins

/** As-of and range join: semantics pinned against a driver-side
  * brute-force recomputation on deterministic pseudo-random data, plus
  * the plan-shape claims (as-of plans NO join node; range join blocks a
  * pair into exactly one bucket).
  */
class JoinsSpec extends SparkSpec {
  import spark.implicits._

  // deterministic LCG so the fixture is stable across runs
  private def lcg(seed: Long): Iterator[Long] =
    Iterator.iterate(seed)(x => x * 6364136223846793005L + 1442695040888963407L).drop(1)

  private val rnd = lcg(42L)
  private val leftRows = (0 until 200).map { i =>
    (i.toLong, s"k${math.floorMod(rnd.next(), 8)}", math.floorMod(rnd.next(), 1000L))
  } // (id, key, t)
  private val rightRows = (0 until 300).map { i =>
    (s"k${math.floorMod(rnd.next(), 10)}", math.floorMod(rnd.next(), 1000L), i * 1.5)
  }.distinct.groupBy(r => (r._1, r._2)).map(_._2.head).toSeq // unique (key, t)

  test("asOf matches brute-force latest-at-or-before per key") {
    val left = leftRows.toDF("id", "k", "t")
    val right = rightRows.toDF("k", "t", "v")
    val got = Joins.asOf(left, right, keys = Seq("k"),
        leftTime = "t", rightTime = "t", matchedTimeAlias = "mt")
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(3)).map(_.asInstanceOf[Long]),
          Option(r.get(4)).map(_.asInstanceOf[Double]))).toMap
    leftRows.foreach { case (id, k, t) =>
      val expect = rightRows.filter(r => r._1 == k && r._2 <= t)
        .sortBy(_._2).lastOption
      assert(got(id) == ((expect.map(_._2), expect.map(_._3))),
        s"left row $id (k=$k, t=$t)")
    }
  }

  test("asOf forward matches brute-force earliest-at-or-after per key") {
    val left = leftRows.toDF("id", "k", "t")
    val right = rightRows.toDF("k", "t", "v")
    val got = Joins.asOf(left, right, keys = Seq("k"),
        leftTime = "t", rightTime = "t", matchedTimeAlias = "mt",
        forward = true)
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(3)).map(_.asInstanceOf[Long]),
          Option(r.get(4)).map(_.asInstanceOf[Double]))).toMap
    leftRows.foreach { case (id, k, t) =>
      val expect = rightRows.filter(r => r._1 == k && r._2 >= t)
        .sortBy(_._2).headOption
      assert(got(id) == ((expect.map(_._2), expect.map(_._3))),
        s"left row $id (k=$k, t=$t)")
    }
  }

  test("asOf tolerance nulls out stale matches") {
    val left = Seq((1L, "a", 100L), (2L, "a", 500L)).toDF("id", "k", "t")
    val right = Seq(("a", 90L, 9.0)).toDF("k", "t", "v")
    val got = Joins.asOf(left, right, keys = Seq("k"),
        leftTime = "t", rightTime = "t", matchedTimeAlias = "mt",
        tolerance = Some((lt, rt) => lt - rt <= lit(50L)))
      .collect().map(r => r.getLong(0) -> Option(r.get(4))).toMap
    assert(got(1L) == Some(9.0)) // within 50
    assert(got(2L) == None)     // 410 behind: stale
  }

  test("time-sharded asOf is bit-identical to the single-window form, both directions") {
    val left = leftRows.toDF("id", "k", "t")
    val right = rightRows.toDF("k", "t", "v")
    for (fwd <- Seq(false, true)) {
      val plain = Joins.asOf(left, right, Seq("k"), "t", "t",
          matchedTimeAlias = "mt", forward = fwd)
        .orderBy("id").collect().map(_.toSeq).toSeq
      // width 64 over t in [0,1000) forces ~16 shards, so within-shard
      // misses genuinely exercise the cross-shard carry
      val sharded = Joins.asOf(left, right, Seq("k"), "t", "t",
          matchedTimeAlias = "mt", forward = fwd,
          timeShard = Some(t => floor(t / 64).cast("long")))
        .orderBy("id").collect().map(_.toSeq).toSeq
      assert(sharded == plain, s"forward=$fwd")
    }
  }

  test("asOf plans one keyed window, no join operator") {
    val left = leftRows.toDF("id", "k", "t")
    val right = rightRows.toDF("k", "t", "v")
    val plan = Joins.asOf(left, right, Seq("k"), "t", "t")
      .queryExecution.optimizedPlan
    assert(plan.collect { case j: Join => j }.isEmpty,
      "as-of must be union+window, not a join")
  }

  test("rangeJoin matches brute-force point-in-interval; half-open; no dup pairs") {
    val points = leftRows.toDF("id", "k", "t")
    // intervals of varying span incl. empty and bucket-straddling ones
    val ivRnd = lcg(7L)
    val ivs = (0 until 80).map { i =>
      val s = math.floorMod(ivRnd.next(), 1000L)
      (i.toLong, s"k${math.floorMod(ivRnd.next(), 8)}", s,
        s + math.floorMod(ivRnd.next(), 250L) - 20L) // some end < start
    }
    val intervals = ivs.toDF("iv_id", "k", "s", "e")
    val got = Joins.rangeJoin(points, "t", intervals, "s", "e",
        bucketWidth = 64L, keys = Seq("k"))
      .select("id", "iv_id").as[(Long, Long)].collect().toSeq
    assert(got.size == got.distinct.size, "no duplicate pairs")
    val expect = for {
      (id, k, t) <- leftRows
      (ivId, ik, s, e) <- ivs
      if ik == k && t >= s && t < e
    } yield (id, ivId)
    assert(got.sorted == expect.sorted)
    assert(expect.nonEmpty) // the fixture actually exercises matches
  }
}
