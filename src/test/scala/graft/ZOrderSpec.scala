package graft

import org.apache.spark.sql.functions._
import graft.operators.ZOrder

/** Z-order clustering: bin exactness (past double precision), curve
  * locality (z-chunks are hypercubes), and the write-side layout
  * property that makes multi-column min/max skipping work.
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  private def grid = (for (x <- 0 until 64; y <- 0 until 64)
    yield (x.toLong, y.toLong)).toDF("x", "y")

  test("rangeBin: exact integral math past 2^53, monotone, clamped") {
    val min = 1L << 60
    val max = min + (1L << 54) - 1 // (v-min)*256 ≈ 2^62: double would round
    val df = Seq(min, min + 1, max - 1, max, min - 100, max + 100).toDF("v")
    val bins = df.select(ZOrder.rangeBin(col("v"), min, max, 8).as("b"))
      .as[Long].collect().toSeq
    assert(bins(0) == 0L && bins(1) == 0L)
    assert(bins(2) == 255L && bins(3) == 255L,
      s"top-of-range must bin to 2^bits-1 exactly, got ${bins(2)}/${bins(3)}" +
        " — a double-rounded division overflows to 256 here")
    // out-of-bounds values clamp to the edge bins, never escape the grid
    assert(bins(4) == 0L && bins(5) == 255L)
  }

  test("z-key chunks are hypercubes: every chunk bounded in BOTH dims") {
    val (keyed, bounds) = ZOrder.withZKey(grid, Seq("x", "y"), bits = 6)
    assert(bounds == Seq((0L, 63L), (0L, 63L)))
    // top 4 key bits = 16 chunks of 256 points; 2 high bits per dim →
    // each chunk spans exactly 16 in x AND 16 in y
    val chunks = keyed.groupBy(shiftright(col("zkey"), 8).as("c"))
      .agg(count(lit(1)).as("n"), (max("x") - min("x")).as("sx"),
        (max("y") - min("y")).as("sy"))
      .collect()
    assert(chunks.length == 16)
    chunks.foreach { r =>
      assert(r.getLong(1) == 256L)
      assert(r.getLong(2) <= 15L && r.getLong(3) <= 15L,
        s"chunk ${r.getLong(0)} spans ${r.getLong(2)}x${r.getLong(3)}")
    }
    // contrast: sorting by x alone leaves y's span at the full range —
    // the single-column layout a second-dimension predicate can't skip
    val naive = grid.withColumn("c", ZOrder.rangeBin(col("x"), 0, 63, 4))
      .groupBy("c").agg((max("y") - min("y")).as("sy")).collect()
    assert(naive.forall(_.getLong(1) == 63L))
  }

  test("clusterByZOrder: every output file bounded in every dimension") {
    val out = tmpDir("zorder") + "/pts"
    ZOrder.clusterByZOrder(grid, Seq("x", "y"), bits = 6, numFiles = 16)
      .write.parquet(out)
    val files = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(files.length >= 8, s"expected a spread layout, got ${files.length}")
    files.foreach { f =>
      val r = spark.read.parquet(f.getPath)
        .agg((max("x") - min("x")).as("sx"), (max("y") - min("y")).as("sy"))
        .head()
      // range boundaries are sampled, so a file may straddle two
      // aligned 16x16 chunks — but never approach the 63 full span
      assert(r.getLong(0) <= 32L && r.getLong(1) <= 32L,
        s"${f.getName} spans ${r.getLong(0)}x${r.getLong(1)}: " +
          "file stats would not prune either dimension")
    }
  }
}
