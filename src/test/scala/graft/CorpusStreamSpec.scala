package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.{CorpusStream, StreamDedup, StreamDoc}

class CorpusStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Long): Timestamp = new Timestamp(86400000L + min * 60000L)

  test("streaming dedup: first arrival wins across batches; in-batch order by (ts, id)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamDoc]
    val q = CorpusStream.dedupStream(input.toDS())
      .writeStream.format("memory").queryName("sdedup").outputMode("append").start()
    try {
      input.addData(
        StreamDoc(1L, "alpha text", ts(0)),
        StreamDoc(2L, "beta text", ts(1)),
        StreamDoc(6L, "twin text", ts(3)), // same content, later ts ...
        StreamDoc(5L, "twin text", ts(2))) // ... earlier ts wins in-batch
      q.processAllAvailable()
      input.addData(
        StreamDoc(3L, "alpha text", ts(10)), // cross-batch duplicate
        StreamDoc(4L, "gamma text", ts(11)))
      q.processAllAvailable()
      val got = spark.table("sdedup").as[StreamDedup].collect()
        .map(d => d.doc_id -> d).toMap
      assert(got(1L).is_first && got(1L).keeper_id === 1L)
      assert(got(5L).is_first && got(5L).keeper_id === 5L, "ts order decides in-batch")
      assert(!got(6L).is_first && got(6L).keeper_id === 5L && got(6L).n_seen_before === 1L)
      assert(!got(3L).is_first && got(3L).keeper_id === 1L,
        "duplicate content detected across micro-batches")
      assert(got(3L).n_seen_before === 1L)
      assert(got(4L).is_first)
    } finally q.stop()
  }

  test("streaming dedup: state expires past watermark + ttl, then restarts as first") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamDoc]
    val q = CorpusStream.dedupStream(input.toDS(),
        watermark = "10 minutes", ttlSeconds = 600L)
      .writeStream.format("memory").queryName("sdexp").outputMode("append").start()
    try {
      input.addData(StreamDoc(1L, "alpha text", ts(0)))
      q.processAllAvailable()
      // watermark jumps to min 90, far past alpha's timeout (min 10)
      input.addData(StreamDoc(2L, "other text", ts(100)))
      q.processAllAvailable()
      input.addData(StreamDoc(3L, "padding", ts(101))) // lets the timeout fire
      q.processAllAvailable()
      input.addData(StreamDoc(4L, "alpha text", ts(102)))
      q.processAllAvailable()
      val alpha = spark.table("sdexp").as[StreamDedup].collect()
        .filter(_.content_hash == spark.range(1)
          .select(graft.corpus.Dedup.contentHash(lit("alpha text"))).as[String].head())
      assert(alpha.length === 2)
      assert(alpha.forall(_.is_first), "expired state restarts the chain as first")
    } finally q.stop()
  }

  test("streaming curation: micro-batches increment the index; replays are exactly-once") {
    import graft.corpus.Curate
    import graft.streaming.CurateDoc
    implicit val sqlCtx = spark.sqlContext
    val stop = "the be to of and that have with"
    def longDoc(seed: String): String =
      (1 to 8).map(i => s"$stop $seed word$i alpha beta gamma delta").mkString(" ")
    val seed = Seq(
      (1L, longDoc("orange"), "https://a.example/1", "en"),
      (2L, longDoc("violet"), "https://a.example/2", "en")
    ).toDF("doc_id", "text", "url", "lang")
    val indexDir = java.nio.file.Files.createTempDirectory("graft-custore").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft-cusink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-cuckpt").toString
    Curate.CurateIndexStore.init(
      Curate.buildIndex(seed, col("doc_id"), col("text"), col("url"), col("lang")),
      indexDir)

    val input = MemoryStream[CurateDoc]
    val q = graft.streaming.CorpusStream
      .curateStream(input.toDF(), indexDir, outDir, ceCap = 1e9)
      .option("checkpointLocation", ckpt).start()
    try {
      input.addData(
        CurateDoc(11L, longDoc("mango"), "https://a.example/1?utm_source=x", "en"),
        CurateDoc(12L, longDoc("fresh"), "https://b.example/12", "en"))
      q.processAllAvailable()
      input.addData(
        CurateDoc(21L, longDoc("violet") + " extra", "https://b.example/21", "en"),
        CurateDoc(22L, longDoc("fresh"), "https://b.example/12?utm_source=y", "en"))
      q.processAllAvailable()
    } finally q.stop()

    val b0 = spark.read.parquet(s"$outDir/batch=0")
      .select(col("doc_id"), col("url_keeper"), col("dedup_keeper"), col("kept"))
      .as[(Long, Boolean, Boolean, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(!b0(11L)._2, "re-crawl of a SEED url is dropped in batch 0")
    assert(b0(12L)._2 && b0(12L)._3 && b0(12L)._4)
    val b1 = spark.read.parquet(s"$outDir/batch=1")
      .select(col("doc_id"), col("url_keeper"), col("dedup_keeper"), col("kept"))
      .as[(Long, Boolean, Boolean, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(b1(21L)._2 && !b1(21L)._3,
      "near-dup of a SEED text joins its cluster across batches")
    assert(!b1(22L)._2, "url first seen in BATCH 0 dedups batch 1 against it")

    // pointer advanced to the last batch; a manual replay of batch 1 is a
    // no-op (audit untouched, pointer unchanged)
    val (_, last) = Curate.CurateIndexStore.load(spark, indexDir)
    assert(last === 1L)
    val before = spark.read.parquet(s"$outDir/batch=1").count()
    Curate.curateBatch(
      Seq((21L, longDoc("violet") + " extra", "https://b.example/21", "en"))
        .toDF("doc_id", "text", "url", "lang"),
      batchId = 1L, indexDir, outDir, ceCap = 1e9)
    val (_, lastAfter) = Curate.CurateIndexStore.load(spark, indexDir)
    assert(lastAfter === 1L && spark.read.parquet(s"$outDir/batch=1").count() === before)

    // crash-before-commit replay: a half-written audit for a NEW batch is
    // recomputed and overwritten, then the pointer commits
    val shard3 = Seq((31L, longDoc("late"), "https://c.example/31", "en"))
      .toDF("doc_id", "text", "url", "lang")
    spark.range(1).toDF("garbage").write.parquet(s"$outDir/batch=2") // the "crash" leftovers
    Curate.curateBatch(shard3, batchId = 2L, indexDir, outDir, ceCap = 1e9)
    val (_, last3) = Curate.CurateIndexStore.load(spark, indexDir)
    assert(last3 === 2L)
    val b2 = spark.read.parquet(s"$outDir/batch=2")
    assert(b2.columns.contains("url_keeper") && b2.count() === 1)

    // crash INSIDE the pointer swing (old CURRENT deleted, staged tmp not
    // yet renamed): load finishes the swing from the durable tmp
    val cur = new java.io.File(s"$indexDir/CURRENT")
    val tmp = new java.io.File(s"$indexDir/CURRENT.tmp")
    java.nio.file.Files.copy(cur.toPath, tmp.toPath)
    assert(cur.delete())
    val (_, recovered) = Curate.CurateIndexStore.load(spark, indexDir)
    assert(recovered === 2L && cur.exists() && !tmp.exists())
  }

  test("streaming gate: batch quality/PII columns run unchanged on a stream") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamDoc]
    val stop = "the be to of and that have with"
    val good = (1 to 8).map(i => s"$stop quality word$i alpha beta gamma delta")
      .mkString(" ") + " mail bob@example.com"
    val q = CorpusStream.gate(input.toDS().toDF())
      .writeStream.format("memory").queryName("sgate").outputMode("append").start()
    try {
      input.addData(StreamDoc(1L, good, ts(0)), StreamDoc(2L, "tiny junk", ts(1)))
      q.processAllAvailable()
      val got = spark.table("sgate")
        .select(col("doc_id"), col("quality_pass"), col("lang"), col("redacted_text"))
        .as[(Long, Boolean, String, String)].collect().map(r => r._1 -> r).toMap
      assert(got(1L)._2 && !got(2L)._2)
      assert(got(1L)._3 === "en")
      assert(got(1L)._4.contains("<EMAIL>") && !got(1L)._4.contains("bob@example.com"))
    } finally q.stop()
  }

  test("streaming ANN index: shards commit O(shard); replays exactly-once; compact folds") {
    import graft.corpus.Similarity
    import graft.streaming.VecDoc
    implicit val sqlCtx = spark.sqlContext
    val dim = 64
    def vec(i: Int): Seq[Double] = {
      val c = i % 5
      Array.tabulate(dim) { d =>
        val center = if (d >= c * 12 && d < c * 12 + 12) 1.0 else 0.0
        center + 0.25 * math.sin(i * 997.0 + d * 31.0)
      }.toSeq
    }
    val seed = (0 until 150).map(i => (i.toLong, vec(i))).toDF("vec_id", "embedding")
    val indexDir = java.nio.file.Files.createTempDirectory("graft-annstore").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-annckpt").toString
    val seedIx = Similarity.buildAnnIndex(seed, col("vec_id"), col("embedding"),
      kClusters = 5, m = 8, ks = 16)
    Similarity.AnnIndexStore.init(seedIx, indexDir)

    val input = MemoryStream[VecDoc]
    val q = CorpusStream.annStream(input.toDF(), indexDir)
      .option("checkpointLocation", ckpt).start()
    try {
      input.addData((150 until 175).map(i => VecDoc(i.toLong, vec(i))): _*)
      q.processAllAvailable()
      input.addData((175 until 200).map(i => VecDoc(i.toLong, vec(i))): _*)
      q.processAllAvailable()
    } finally q.stop()

    val queries = seed.limit(5)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    def resultsOf(ix: Similarity.AnnIndex) =
      Similarity.annQuery(ix, queries, col("qid"), col("qv"),
        k = 5, nprobe = 1, rerank = 20)
        .select("query_id", "rank", "neighbor_id")
        .as[(Long, Int, Long)].collect().toSet

    // streamed store == the in-memory increment chain over the same shards
    val shard1 = (150 until 175).map(i => (i.toLong, vec(i))).toDF("vec_id", "embedding")
    val shard2 = (175 until 200).map(i => (i.toLong, vec(i))).toDF("vec_id", "embedding")
    val expected = resultsOf(Similarity.annIncrement(
      Similarity.annIncrement(seedIx, shard1, col("vec_id"), col("embedding")),
      shard2, col("vec_id"), col("embedding")))
    val (streamed, last) = Similarity.AnnIndexStore.load(spark, indexDir)
    assert(last === 1L)
    assert(streamed.coded.count() === 200 && streamed.vectors.count() === 200)
    assert(resultsOf(streamed) === expected)

    // manual replay of a committed batch is a no-op (no duplicate rows)
    Similarity.AnnIndexStore.annBatch(shard2, batchId = 1L, indexDir,
      col("vec_id"), col("embedding"))
    val (replayed, lastAfter) = Similarity.AnnIndexStore.load(spark, indexDir)
    assert(lastAfter === 1L && replayed.coded.count() === 200)

    // monotone-id contract enforced from the pointer watermark alone
    val stale = Seq((10L, vec(10))).toDF("vec_id", "embedding")
    val ex = intercept[IllegalArgumentException] {
      Similarity.AnnIndexStore.annBatch(stale, batchId = 2L, indexDir,
        col("vec_id"), col("embedding"))
    }
    assert(ex.getMessage.contains("max_vec_id"))

    // crash-before-commit: an orphan shard dir from a dead attempt is
    // overwritten by the replay, then the pointer commits
    spark.range(1).toDF("garbage").write.parquet(s"$indexDir/v2/coded")
    val shard3 = Seq((200L, vec(200))).toDF("vec_id", "embedding")
    Similarity.AnnIndexStore.annBatch(shard3, batchId = 2L, indexDir,
      col("vec_id"), col("embedding"))
    val (withLate, last3) = Similarity.AnnIndexStore.load(spark, indexDir)
    assert(last3 === 2L && withLate.coded.count() === 201)

    // crash INSIDE the pointer swing: load finishes from the durable tmp
    val cur = new java.io.File(s"$indexDir/CURRENT")
    val tmp = new java.io.File(s"$indexDir/CURRENT.tmp")
    java.nio.file.Files.copy(cur.toPath, tmp.toPath)
    assert(cur.delete())
    val (_, recovered) = Similarity.AnnIndexStore.load(spark, indexDir)
    assert(recovered === 2L && cur.exists() && !tmp.exists())

    // compact: one self-contained version, same answers, same watermark
    Similarity.AnnIndexStore.compact(spark, indexDir)
    val (compacted, lastC) = Similarity.AnnIndexStore.load(spark, indexDir)
    assert(lastC === 2L && compacted.coded.count() === 201)
    assert(resultsOf(compacted) === expected)
    assert(!new java.io.File(s"$indexDir/seed").exists() &&
      !new java.io.File(s"$indexDir/v1").exists())
    // and the store keeps accepting shards after a compact
    Similarity.AnnIndexStore.annBatch(
      Seq((201L, vec(201))).toDF("vec_id", "embedding"), batchId = 3L, indexDir,
      col("vec_id"), col("embedding"))
    val (after, last4) = Similarity.AnnIndexStore.load(spark, indexDir)
    assert(last4 === 3L && after.coded.count() === 202)
  }
}
