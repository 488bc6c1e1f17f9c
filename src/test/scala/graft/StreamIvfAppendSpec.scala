package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import graft.llm.Similarity
import graft.streaming.DocStream

/** Streaming maintenance of the IVF ANN index (DocStream.ivfAppendSink):
  * per-trigger tagged appends keep the stream-maintained index
  * search-identical to a full rebuild over everything ever delivered,
  * and a replayed or crashed micro-batch cannot double-admit — the
  * streaming twin of the `x_cosine_ann_ivf_append` contract.
  */
class StreamIvfAppendSpec extends SparkSpec {
  import spark.implicits._

  // orthogonal axes as centroids: a vector lands in the cell of its
  // largest component — deterministic assignment, no training
  private val cents = Seq(
    Seq(1.0, 0.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0, 0.0),
    Seq(0.0, 0.0, 1.0, 0.0), Seq(0.0, 0.0, 0.0, 1.0))

  private def vecsDf(rows: (Long, Seq[Double])*): DataFrame =
    rows.toSeq.toDF("vec_id", "embedding")

  // base corpus populates cells 0..2 only — cell 3 stays EMPTY so the
  // stream's first trigger exercises the new-cell liveness path
  private def baseVecs = vecsDf(
    1L -> Seq(0.9, 0.1, 0.0, 0.0),
    2L -> Seq(0.1, 0.9, 0.0, 0.0),
    3L -> Seq(0.0, 0.1, 0.9, 0.0))

  private def assertSearchEqualsRebuild(idx: String, corpus: DataFrame,
      tag: String): Unit = {
    val rebuilt = tmpDir(s"st-ivf-rebuild-$tag") + "/index"
    Similarity.ivfWriteIndex(corpus, cents, rebuilt)
    val viaStream = Similarity.ivfSearchIndex(spark, idx, corpus,
      k = 3, cents, nProbe = 2)
    val viaRebuild = Similarity.ivfSearchIndex(spark, rebuilt, corpus,
      k = 3, cents, nProbe = 2)
    assert(viaStream.exceptAll(viaRebuild).isEmpty &&
      viaRebuild.exceptAll(viaStream).isEmpty,
      s"stream-maintained index diverged from full rebuild after $tag")
  }

  test("two ordered triggers keep the maintained index search-equal " +
      "to a full rebuild (incl. populating an empty cell)") {
    implicit val sq = spark.sqlContext
    val root = tmpDir("st-ivf")
    val idx = s"$root/index"
    Similarity.ivfWriteIndex(baseVecs, cents, idx)
    val mem = MemoryStream[(Long, Seq[Double])]
    val q = DocStream.ivfAppendSink(
      mem.toDF().toDF("vec_id", "embedding"),
      graft.llm.IvfQuantizer(cents), idx, s"$root/ckpt",
      trigger = Trigger.ProcessingTime(0L))
    // trigger 1: one near-dup of a resident vector, one vector for the
    // EMPTY cell 3 — the cell must turn live or the search misses it
    val d1 = Seq(10L -> Seq(0.8, 0.2, 0.0, 0.0),
      11L -> Seq(0.0, 0.0, 0.1, 0.9))
    // trigger 2: a later wave into an already-appended cell
    val d2 = Seq(12L -> Seq(0.2, 0.8, 0.0, 0.0))
    try {
      mem.addData(d1: _*)
      q.processAllAvailable()
      assertSearchEqualsRebuild(idx, baseVecs.union(vecsDf(d1: _*)), "t1")
      mem.addData(d2: _*)
      q.processAllAvailable()
      assertSearchEqualsRebuild(idx,
        baseVecs.union(vecsDf(d1: _*)).union(vecsDf(d2: _*)), "t2")
    } finally q.stop()
  }

  test("a replayed committed tag is a no-op; stray staging dirs are " +
      "invisible to the search") {
    val root = tmpDir("st-ivf-replay")
    val idx = s"$root/index"
    Similarity.ivfWriteIndex(baseVecs, cents, idx)
    val delta = vecsDf(10L -> Seq(0.8, 0.2, 0.0, 0.0))
    assert(Similarity.ivfAppendIndexTagged(delta, cents, idx,
      "batch-000000000"), "first admission must append")
    val n1 = spark.read.parquet(idx).count()
    assert(!Similarity.ivfAppendIndexTagged(delta, cents, idx,
      "batch-000000000"), "replayed tag must be a no-op")
    assert(spark.read.parquet(idx).count() == n1,
      "replay double-admitted rows")
    // an in-flight writer's staging area (underscore-prefixed) must
    // never surface in a reader's scan or partition discovery
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(idx, "_staging/pending"))
    val corpus = baseVecs.union(delta)
    assertSearchEqualsRebuild(idx, corpus, "replay")
    // crash BETWEEN the ledger commit and the staging cleanup: the
    // replay of a COMMITTED tag must reclaim its orphaned staging dir
    // (r17 review — the early return used to skip it forever)
    val orphan = new org.apache.hadoop.fs.Path(idx,
      "_staging/batch-000000000")
    fs.mkdirs(orphan)
    assert(!Similarity.ivfAppendIndexTagged(delta, cents, idx,
      "batch-000000000"))
    assert(!fs.exists(orphan),
      "committed-tag replay must reclaim its orphaned staging dir")
  }

  test("ivfPqAppendIndexTagged: exactly-once PQ append equals full " +
      "rebuild; replayed tag is a no-op") {
    // same staged-commit machinery as the flat IVF sink, with the PQ
    // assignment (frozen coarse quantizer + frozen codebooks) — so the
    // PQ index is stream-maintainable under identical replay/crash
    // guarantees
    import org.apache.spark.sql.functions.col
    val e = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val cents8 = Similarity.trainCentroids(e, nCentroids = 8,
      lloydIters = 1)
    val q8 = graft.llm.IvfQuantizer(cents8)
    val cbs = Similarity.trainPqCodebooks(e, numSub = 8,
      codesPerSub = 16, lloydIters = 1)
    val idx = tmpDir("st-ivfpq-tagged") + "/index"
    Similarity.ivfPqWriteIndex(e.filter(col("vec_id") % 2 === 0), q8,
      cbs, idx)
    val delta = e.filter(col("vec_id") % 2 =!= 0)
    assert(Similarity.ivfPqAppendIndexTagged(delta, q8, cbs, idx,
      "batch-000000000"), "first admission must append")
    assert(!Similarity.ivfPqAppendIndexTagged(delta, q8, cbs, idx,
      "batch-000000000"), "replayed tag must be a no-op")
    val rebuilt = tmpDir("st-ivfpq-rebuild") + "/index"
    Similarity.ivfPqWriteIndex(e, q8, cbs, rebuilt)
    val queries = e.filter(col("vec_id") < 4)
    val viaTagged = Similarity.ivfPqSearchIndex(spark, idx, queries,
      k = 5, q8, cbs, nProbe = 4, rerank = 16)
    val viaRebuild = Similarity.ivfPqSearchIndex(spark, rebuilt, queries,
      k = 5, q8, cbs, nProbe = 4, rerank = 16)
    assert(viaTagged.exceptAll(viaRebuild).isEmpty &&
      viaRebuild.exceptAll(viaTagged).isEmpty,
      "tagged-maintained PQ index diverged from full rebuild")
  }

  test("ivfPqAppendSink: two ordered triggers keep the PQ index " +
      "search-equal to a full rebuild") {
    implicit val sq = spark.sqlContext
    import org.apache.spark.sql.functions.col
    val root = tmpDir("st-ivfpq-sink")
    val idx = s"$root/index"
    val q4 = graft.llm.IvfQuantizer(cents)
    val cbs = Similarity.trainPqCodebooks(baseVecs, numSub = 2,
      codesPerSub = 4, lloydIters = 1)
    Similarity.ivfPqWriteIndex(baseVecs, q4, cbs, idx)
    val mem = MemoryStream[(Long, Seq[Double])]
    val q = DocStream.ivfPqAppendSink(
      mem.toDF().toDF("vec_id", "embedding"), q4, cbs, idx,
      s"$root/ckpt", trigger = Trigger.ProcessingTime(0L))
    val d1 = Seq(10L -> Seq(0.8, 0.2, 0.0, 0.0),
      11L -> Seq(0.0, 0.0, 0.1, 0.9))
    val d2 = Seq(12L -> Seq(0.2, 0.8, 0.0, 0.0))
    def check(sofar: DataFrame, tag: String): Unit = {
      val rebuilt = tmpDir(s"st-ivfpq-sink-rb-$tag") + "/index"
      Similarity.ivfPqWriteIndex(sofar, q4, cbs, rebuilt)
      val a = Similarity.ivfPqSearchIndex(spark, idx, sofar, k = 3,
        q4, cbs, nProbe = 2, rerank = 4)
      val b = Similarity.ivfPqSearchIndex(spark, rebuilt, sofar, k = 3,
        q4, cbs, nProbe = 2, rerank = 4)
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
        s"stream-maintained PQ index diverged from rebuild after $tag")
    }
    try {
      mem.addData(d1: _*)
      q.processAllAvailable()
      check(baseVecs.union(vecsDf(d1: _*)), "t1")
      mem.addData(d2: _*)
      q.processAllAvailable()
      check(baseVecs.union(vecsDf(d1: _*)).union(vecsDf(d2: _*)), "t2")
    } finally q.stop()
  }

  test("a crashed attempt's moved files are reclaimed exactly, then " +
      "the retry admits once") {
    val root = tmpDir("st-ivf-crash")
    val idx = s"$root/index"
    Similarity.ivfWriteIndex(baseVecs, cents, idx)
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // simulate the worst crash point: the attempt moved a file into a
    // live cell and died BEFORE its ledger commit — the move-list in
    // its staging dir is the only record of what it touched
    val strayRel = "cid=0/t-batch-000000001-part-crashed.parquet"
    val stray = new org.apache.hadoop.fs.Path(idx, strayRel)
    val o1 = fs.create(stray, false)
    o1.write("not even parquet".getBytes("UTF-8")); o1.close()
    val ml = new org.apache.hadoop.fs.Path(idx,
      "_staging/batch-000000001/_movelist")
    val o2 = fs.create(ml, false)
    o2.write(strayRel.getBytes("UTF-8")); o2.close()
    // the retry (same tag, uncommitted) reclaims the stray and admits
    val delta = vecsDf(10L -> Seq(0.8, 0.2, 0.0, 0.0))
    assert(Similarity.ivfAppendIndexTagged(delta, cents, idx,
      "batch-000000001"), "retry of an uncommitted tag must admit")
    assert(!fs.exists(stray),
      "crashed attempt's moved file survived the reclaim")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(idx,
      "_staging/batch-000000001")), "staging dir must be cleaned up")
    assertSearchEqualsRebuild(idx, baseVecs.union(delta), "crash-retry")
  }
}
