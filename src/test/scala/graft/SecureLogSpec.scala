package graft

import org.apache.spark.sql.functions._

import graft.functions.SecureLog

/** Forward-secure logging: $(slog)/slogverify semantics (reference
  * modules/secure-logging) with the declared PRF substitution. */
class SecureLogSpec extends SparkSpec {
  import spark.implicits._

  private lazy val convs: Seq[String] =
    graft.transcripts.Transcripts.load(spark, sfUnit)
      .select("conv_id").distinct().orderBy("conv_id")
      .as[String].take(3).toSeq
  private lazy val turns = graft.transcripts.Transcripts.load(spark, sfUnit)
    .filter(col("conv_id").isin(convs: _*))

  test("round trip: encrypt then verify recovers every message in order") {
    val enc = SecureLog.encrypt(turns, col("conv_id"), col("turn_idx"), col("text"), "s3cret")
    val dec = SecureLog.verify(enc, "s3cret")
    assert(dec.filter(!col("ok")).count() === 0)
    val want = turns.select(col("conv_id"), col("turn_idx").cast("long"), col("text"))
      .as[(String, Long, String)].collect().sortBy(r => (r._1, r._2))
    val got = dec.select("conv_id", "counter", "text")
      .as[(String, Long, String)].collect().sortBy(r => (r._1, r._2))
    // counters are dense per conversation; texts match in order
    assert(got.map(_._3).toSeq === want.map(_._3).toSeq)
  }

  test("deterministic: same input + secret produce identical bytes (retry safety)") {
    val a = SecureLog.encrypt(turns, col("conv_id"), col("turn_idx"), col("text"), "k")
      .collect().sortBy(e => (e.conv_id, e.counter))
    val b = SecureLog.encrypt(turns, col("conv_id"), col("turn_idx"), col("text"), "k")
      .collect().sortBy(e => (e.conv_id, e.counter))
    assert(a.map(_.entry).toSeq === b.map(_.entry).toSeq)
    assert(a.map(_.mac).toSeq === b.map(_.mac).toSeq)
    // ciphertexts differ between entries even for equal plaintexts (key evolves)
    assert(a.map(_.entry).distinct.length === a.length)
  }

  test("wrong secret authenticates nothing; forward security holds per stream") {
    val enc = SecureLog.encrypt(turns, col("conv_id"), col("turn_idx"), col("text"), "right")
    assert(SecureLog.verify(enc, "wrong").filter(col("ok")).count() === 0)
  }

  test("tampering one entry breaks it and the rest of ITS stream only") {
    val enc = SecureLog.encrypt(turns, col("conv_id"), col("turn_idx"), col("text"), "k")
    val tampered = enc.toDF()
      .withColumn("entry",
        when(col("conv_id") === convs(1) && col("counter") === 1,
          // flip the ciphertext: valid base64, wrong bytes
          concat(lit("AAAA"), expr("substring(entry, 5, length(entry))")))
          .otherwise(col("entry")))
      .as[SecureLog.Entry](org.apache.spark.sql.Encoders.product[SecureLog.Entry])
    val v = SecureLog.verify(tampered, "k").collect()
    val byConv = v.groupBy(_.conv_id)
    // conv-2: entry 0 fine, 1.. all fail (chain diverges after corruption)
    val c2 = byConv(convs(1)).sortBy(_.counter)
    assert(c2.head.ok)
    assert(c2.drop(1).forall(!_.ok))
    // other conversations unaffected
    assert(byConv.filterNot(_._1 == convs(1)).values.flatten.forall(_.ok))
  }

  test("truncation/reorder detection: a removed entry fails verification from the gap") {
    val enc = SecureLog.encrypt(turns, col("conv_id"), col("turn_idx"), col("text"), "k")
    val cut = enc.filter(!(col("conv_id") === convs(0) && col("counter") === 2))
    val v = SecureLog.verify(cut, "k").filter(col("conv_id") === convs(0))
      .collect().sortBy(_.counter)
    assert(v.take(2).forall(_.ok))       // entries 0,1 fine
    assert(v.drop(2).forall(!_.ok))      // gap onward cannot authenticate
  }
}
