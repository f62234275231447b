package graft.functions

import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest
import java.util.Base64

import javax.crypto.{Cipher, Mac}
import javax.crypto.spec.{GCMParameterSpec, SecretKeySpec}

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Forward-secure encrypted logging — the reference's secure-logging
  * module: `$(slog)` template function + `slogverify` tool (reference
  * `modules/secure-logging/slog.c`, scheme per its sLogEntry:306/
  * evolveKey:468). Properties reproduced:
  *
  *  - '''forward security''': each entry is encrypted under a one-use key
  *    `k_i`; `k_{i+1} = PRF(k_i, γ)` and `k_i` is discarded, so compromising
  *    the host after entry `i` reveals nothing about entries `< i`;
  *  - '''sub-key separation''': encryption and MAC keys are derived from
  *    `k_i` with distinct patterns (slog.c:82-97 IPAD/OPAD);
  *  - '''aggregated MAC''': a running MAC over every ciphertext detects
  *    tampering, reordering, and truncation of the sequence;
  *  - '''numbered entries''': the counter rides each entry; gaps are
  *    detected at verification (slogverify).
  *
  * Declared primitive substitutions (the reference's exact bytes need
  * AES-CMAC, which the JDK does not ship; no external deps allowed):
  * PRF = HMAC-SHA256 instead of AES-CMAC-based PRF, entry cipher stays
  * AES-256-GCM. The GCM IV is derived `PRF(k_i, "iv")` instead of random —
  * safe because each `k_i` encrypts exactly one message, and required by
  * the repo determinism rule (stage retries must reproduce bytes).
  *
  * '''Spark shape.''' Key evolution is inherently sequential — the
  * reference is a single chain because the daemon is a single process. The
  * engine's unit of sequence is the conversation: each `conv_id` gets its
  * own chain seeded `PRF(mainKey, conv_id)`, so encryption parallelizes
  * across conversations (groupByKey → per-group in-memory fold; groups are
  * single conversations, bounded) while every per-stream guarantee holds
  * per log stream. One shuffle by conv_id; no driver-side crypto.
  */
object SecureLog {

  private val KeyLen = 32
  private val IvLen = 12
  private val TagBits = 128

  final case class Entry(conv_id: String, counter: Long, entry: String, mac: String)
  final case class Verified(conv_id: String, counter: Long, text: String, ok: Boolean)

  def mainKey(secret: String): Array[Byte] =
    MessageDigest.getInstance("SHA-256").digest(secret.getBytes(UTF_8))

  private def prf(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val m = Mac.getInstance("HmacSHA256")
    m.init(new SecretKeySpec(key, "HmacSHA256"))
    m.doFinal(data)
  }
  private def prf(key: Array[Byte], s: String): Array[Byte] = prf(key, s.getBytes(UTF_8))

  /** k_{i+1} = PRF(k_i, γ) — slog.c:468 evolveKey. */
  private def evolve(k: Array[Byte]): Array[Byte] = prf(k, "graft-slog-gamma")
  private def encKey(k: Array[Byte]): Array[Byte] = prf(k, "graft-slog-ipad")
  private def macKey(k: Array[Byte]): Array[Byte] = prf(k, "graft-slog-opad")

  private def gcm(mode: Int, key: Array[Byte], iv: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val c = Cipher.getInstance("AES/GCM/NoPadding")
    c.init(mode, new SecretKeySpec(key.take(KeyLen), "AES"), new GCMParameterSpec(TagBits, iv))
    c.doFinal(data)
  }

  /** One conversation's chain: fold rows in order, yielding encrypted
    * entries with the running aggregated MAC. */
  private def chain(conv: String, texts: Iterator[String], main: Array[Byte]): Iterator[Entry] = {
    var k = prf(main, conv) // per-stream initial key
    var agg = new Array[Byte](KeyLen) // zero start, like the reference's fresh MAC
    var counter = 0L
    texts.map { text =>
      val ek = encKey(k)
      val iv = prf(k, "iv").take(IvLen)
      val ct = gcm(Cipher.ENCRYPT_MODE, ek, iv, if (text == null) Array.emptyByteArray else text.getBytes(UTF_8))
      // aggregated MAC: MAC_{i} = HMAC(mk_i, MAC_{i-1} || counter || ct)
      agg = prf(macKey(k),
        agg ++ java.nio.ByteBuffer.allocate(8).putLong(counter).array() ++ ct)
      val e = Entry(conv, counter,
        Base64.getEncoder.encodeToString(iv ++ ct),
        agg.map("%02x".format(_)).mkString)
      k = evolve(k)
      counter += 1
      e
    }
  }

  /** Encrypt `text` per conversation stream, ordered by `order`.
    * Output: (conv_id, counter, entry = base64(iv||ct||tag), mac = running
    * aggregated MAC hex). Deterministic: same input + secret → same bytes.
    */
  def encrypt(df: DataFrame, conv: Column, order: Column, text: Column,
      secret: String): Dataset[Entry] = {
    val spark = df.sparkSession
    import spark.implicits._
    val main = mainKey(secret)
    df.select(conv.cast("string").as("c"), order.cast("long").as("o"),
        text.cast("string").as("t"))
      .as[(String, Long, String)]
      .groupByKey(_._1)
      .flatMapGroups { (c, rows) =>
        // a group is ONE conversation — bounded; sort once in memory
        chain(c, rows.toSeq.sortBy(_._2).iterator.map(_._3), main)
      }
  }

  /** slogverify: re-derive every chain, decrypt, recompute the aggregated
    * MAC. `ok=false` rows are tampered/truncated/reordered suffixes —
    * after the first corrupt entry the key material diverges, so the rest
    * of that stream cannot authenticate (the forward-security property).
    * A missing counter (gap) likewise fails from the gap onward.
    */
  def verify(entries: Dataset[Entry], secret: String): Dataset[Verified] = {
    val spark = entries.sparkSession
    import spark.implicits._
    val main = mainKey(secret)
    entries.groupByKey(_.conv_id).flatMapGroups { (c, rows) =>
      var k = prf(main, c)
      var agg = new Array[Byte](KeyLen)
      var expect = 0L
      var broken = false
      rows.toSeq.sortBy(_.counter).iterator.map { e =>
        val blob = try Base64.getDecoder.decode(e.entry) catch { case _: IllegalArgumentException => null }
        var text: String = null
        var ok = false
        if (!broken && e.counter == expect && blob != null && blob.length > IvLen) {
          val (iv, ct) = blob.splitAt(IvLen)
          try {
            val ivWant = prf(k, "iv").take(IvLen)
            if (!java.util.Arrays.equals(iv, ivWant)) throw new SecurityException
            text = new String(gcm(Cipher.DECRYPT_MODE, encKey(k), iv, ct), UTF_8)
            agg = prf(macKey(k),
              agg ++ java.nio.ByteBuffer.allocate(8).putLong(e.counter).array() ++ ct)
            ok = agg.map("%02x".format(_)).mkString == e.mac
          } catch { case _: Exception => ok = false }
        }
        if (!ok) { broken = true; text = null }
        else { k = evolve(k); expect += 1 }
        Verified(c, e.counter, text, ok)
      }
    }
  }
}
