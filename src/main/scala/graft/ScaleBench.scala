package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-curve evidence for the dedup/curation tier: the SAME headliner
  * operators over a 1× and a 10× corpus, each carrying a planted VIRAL
  * duplicate group that grows with the corpus (10⁴ → 10⁵ identical
  * copies). This is the size regime where naive all-doc LSH banding is
  * fatal — a 10⁵-copy group alone is 10¹⁰ candidate pairs inside one band
  * bucket, while the viral-safe edge construction (content star edges ∪
  * banding one representative per distinct content, `Dedup.corpusEdges`)
  * keeps it at 10⁵ star edges. A ~linear 1×→10× wall-clock curve is the
  * direct evidence the construction delivers what it promises.
  *
  * Deterministic scaling: replica texts get a distinct ` repN` suffix so
  * UNIQUE content grows linearly (replication without mutation would turn
  * every doc into a rep-sized duplicate group and measure a different
  * workload); viral docs are byte-identical by construction. No rand().
  *
  * Prints ONE JSON line:
  * `{"metric":"dedup_scale_curve","scales":{"1x":{...},"10x":{...}},
  *   "ratios":{...}}` — per-op wall seconds (min over 2, same discipline
  * as Bench) and the 10×/1× time ratio next to the 10.0 size ratio.
  *
  * Knobs: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
  * SPARK_GRAFT_SCALE_CPUS (default 32), SPARK_GRAFT_VIRAL_PER_REP
  * (default 10000), SPARK_GRAFT_SCALE_REPS (default "1,10").
  */
object ScaleBench {

  private val viralText: String =
    ("breaking viral news page please subscribe and share this exact story " +
      "with everyone you know the content below is identical on every mirror " +
      "and aggregator that scraped it ").repeat(2).trim

  /** sf documents ×rep with distinct replica texts + rep×viralPerRep
    * byte-identical viral docs above the organic id range. */
  private def corpus(spark: SparkSession, sfDir: String, rep: Int,
      viralPerRep: Int): DataFrame = {
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text", "lang")
    val idSpan = base.agg(max(col("doc_id"))).head().getLong(0) + 1
    val organic = base
      .withColumn("r", explode(sequence(lit(0), lit(rep - 1))))
      .select((col("doc_id") + col("r") * idSpan).as("doc_id"),
        when(col("r") === 0, col("text"))
          .otherwise(concat(col("text"), lit(" rep"), col("r"))).as("text"),
        col("lang"))
    val viralBase = idSpan * rep
    val viral = spark.range(viralPerRep.toLong * rep)
      .select((lit(viralBase) + col("id")).as("doc_id"),
        lit(viralText).as("text"), lit("en").as("lang"))
    organic.unionByName(viral)
      .repartition(spark.sparkContext.defaultParallelism)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_SCALE_CPUS", "32").toInt
    val viralPerRep = sys.env.getOrElse("SPARK_GRAFT_VIRAL_PER_REP", "10000").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_SCALE_REPS", "1,10")
      .split(',').map(_.trim.toInt).toSeq
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.local.dir", "/dev/shm/spark-local")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    import graft.corpus.{Curate, Dedup, SpanDedup}

    // per-op builders over a MATERIALIZED corpus frame (the corpus build
    // itself — explode + union — is excluded from op timings)
    def ops(docs: DataFrame): Seq[(String, () => Long)] = Seq(
      "dedup_exact" -> (() =>
        Dedup.exact(docs, col("doc_id"), col("text")).count()),
      "dedup_pipeline" -> (() =>
        Dedup.dedupCorpus(docs, col("doc_id"), col("text")).count()),
      "dedup_paragraphs" -> (() => {
        val page = concat(substring(col("text"), 1, 60), lit("\n\n"),
          lit("cookie consent banner please accept our terms and privacy " +
            "policy version v"), pmod(col("doc_id"), lit(3)).cast("string"))
        SpanDedup.nearDedupSpans(
          docs.withColumn("__page", page), col("doc_id"),
          SpanDedup.paragraphSpans(col("__page"), "\n\n"), delim = "\n\n")
          .count()
      }),
      "corpus_curate" -> (() => {
        val url = concat(lit("https://www.example.com/page/"),
          (col("doc_id") - pmod(col("doc_id"), lit(2))).cast("string"))
        Curate.curate(docs, col("doc_id"), col("text"), url, col("lang"),
          targetLang = "en", ceCap = 1.13).count()
      }))

    def timeIt(f: () => Long): Double = {
      val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
    }

    val results = reps.map { rep =>
      val docs = corpus(spark, sfDir, rep, viralPerRep)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nDocs = docs.count()
      val timings = ops(docs).map { case (name, f) =>
        name -> math.min(timeIt(f), timeIt(f)) // min over 2, as in Bench
      }
      docs.unpersist(blocking = true)
      (rep, nDocs, timings)
    }

    def j(d: Double): String = f"$d%.3f"
    val scalesJson = results.map { case (rep, n, ts) =>
      s""""${rep}x":{"docs":$n,"viral_copies":${viralPerRep.toLong * rep},""" +
        ts.map { case (k, v) => s""""$k":${j(v)}""" }.mkString(",") + "}"
    }.mkString(",")
    val ratios =
      if (results.size >= 2) {
        val (repLo, nLo, lo) = results.head
        val (repHi, nHi, hi) = results.last
        val sizeRatio = nHi.toDouble / nLo
        val rs = lo.zip(hi).map { case ((k, a), (_, b)) =>
          s""""$k":${j(b / a)}"""
        }.mkString(",")
        s""","size_ratio":${j(sizeRatio)},"time_ratios":{$rs}"""
      } else ""
    println(s"""{"metric":"dedup_scale_curve","sf_dir":"$sfDir","cpus":$cpus,""" +
      s""""scales":{$scalesJson}$ratios}""")
    spark.stop()
  }
}
