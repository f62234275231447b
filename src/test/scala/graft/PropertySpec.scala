package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.{TemplateFunctions, Templates}
import graft.parsers.FieldParsers

/** Property tests (SURVEY §5: parser round-trips and filter-algebra
  * equivalences, the scalacheck tier). Samples are generated with a fixed
  * seed and evaluated in ONE Spark job per property (a row per sample) —
  * not one job per sample.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val keyGen = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString.take(8))
  private val valGen = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString.take(12))

  test("kv round trip: format k=v pairs → kvParser recovers every pair") {
    val pairsGen = Gen.nonEmptyListOf(Gen.zip(keyGen, valGen)).map(_.distinctBy(_._1).take(6))
    val cases = samples(pairsGen, 120).filter(_.nonEmpty)
    val df = cases.zipWithIndex
      .map { case (kvs, i) => (i, kvs.map { case (k, v) => s"$k=$v" }.mkString(" ")) }
      .toDF("id", "line")
      .withColumn("m", FieldParsers.kvParser(col("line")))
    val got = df.select(col("id"), col("m")).as[(Int, Map[String, String])].collect().toMap
    cases.zipWithIndex.foreach { case (kvs, i) =>
      assert(got(i) === kvs.toMap, s"case $i: ${kvs.mkString(",")}")
    }
  }

  test("WordShingles expression ≡ composed builtins (split/transform/concat_ws/distinct)") {
    // texts with empty tokens, repeats, multi-space runs, unicode, short docs
    val tokGen = Gen.oneOf(Gen.oneOf("a", "b", "ab", "", "répé", "x1"),
      Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString.take(5)))
    val textGen = Gen.listOf(tokGen).map(_.mkString(" "))
    val texts = samples(textGen, 200) ++ Seq("", " ", "  ", "a", "a b", null)
    Seq(2, 3, 8).foreach { k =>
      val df = texts.zipWithIndex.map { case (t, i) => (i, t) }.toDF("id", "text")
      val w = split(col("text"), " ")
      val composed = array_distinct(
        when(size(w) >= k,
          transform(sequence(lit(1), size(w) - (k - 1)),
            i => concat_ws(" ", (0 until k).map(o => element_at(w, i + o)): _*)))
          .otherwise(array()))
      val got = df.select(col("id"),
        graft.corpus.Dedup.shingles(col("text"), k).as("fast"),
        composed.as("slow")).as[(Int, Seq[String], Seq[String])].collect()
      got.foreach { case (i, fast, slow) =>
        assert(fast === slow, s"k=$k case $i text=${texts(i)}")
      }
    }
  }

  test("RepetitionStats expression ≡ naive Scala recompute (random line-bearing texts)") {
    def naive(s: String): Seq[Double] = {
      if (s == null || s.isEmpty) return Seq.fill(13)(0.0)
      def cp(x: String) = x.codePointCount(0, x.length).toDouble
      val total = cp(s)
      def unitStats(units: Seq[String]): Seq[Double] = {
        val byU = units.groupBy(identity)
        val tot = units.map(cp).sum
        val dup = byU.collect { case (u, os) if os.size >= 2 => cp(u) * (os.size - 1) }.sum
        Seq((units.size - byU.size).toDouble / units.size, if (tot > 0) dup / tot else 0.0)
      }
      val words = s.split("\\s+", -1).toSeq
      def grams(n: Int) =
        if (words.size < n) Seq.empty[String] else words.sliding(n).map(_.mkString(" ")).toSeq
      val tops = (2 to 4).map { n =>
        val g = grams(n)
        if (g.isEmpty) 0.0
        else {
          val counts = g.groupBy(identity).view.mapValues(_.size).toMap
          val (bg, bc) = counts.toSeq.sortBy { case (k, c) => (-c, k) }.head._1 ->
            counts.toSeq.sortBy { case (k, c) => (-c, k) }.head._2
          bc * cp(bg) / total
        }
      }
      val covs = (5 to 10).map { n =>
        val g = grams(n)
        if (g.isEmpty) 0.0
        else {
          val counts = g.groupBy(identity).view.mapValues(_.size).toMap
          val covered = Array.fill(words.size)(false)
          g.zipWithIndex.foreach { case (gr, i) =>
            if (counts(gr) >= 2) (i until i + n).foreach(covered(_) = true)
          }
          words.indices.collect { case i if covered(i) => cp(words(i)) }.sum / total
        }
      }
      unitStats(s.split("\n", -1).toSeq) ++ unitStats(s.split("\n\n", -1).toSeq) ++ tops ++ covs
    }
    val wordGen = Gen.oneOf("a", "b", "aa", "ab", "x", "yz")
    val sepGen = Gen.frequency(6 -> Gen.const(" "), 3 -> Gen.const("\n"), 2 -> Gen.const("\n\n"))
    val textGen = Gen.nonEmptyListOf(Gen.zip(wordGen, sepGen))
      .map(_.map { case (w, sep) => w + sep }.mkString.trim)
    val texts = samples(textGen, 250).filter(_.nonEmpty) ++ Seq("a", "a\na", "a b a b a b")
    val df = texts.zipWithIndex.map { case (t, i) => (i, t) }.toDF("id", "text")
      .select(col("id"), graft.corpus.TextStats.repetition(col("text")).as("r"))
      .select(col("id"), array((0 until 13).map(i => col("r").getField(
        graft.functions.RepetitionStats.fieldNames(i))): _*).as("v"))
    val got = df.as[(Int, Seq[Double])].collect().toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      val want = naive(t)
      got(i).zip(want).zipWithIndex.foreach { case ((g, w), f) =>
        assert(math.abs(g - w) < 1e-12,
          s"case $i field ${graft.functions.RepetitionStats.fieldNames(f)} text=${t.replace("\n", "\\n")}")
      }
    }
  }

  test("json round trip: format-json ∘ json-parser = identity on (k, v) fields") {
    val vGen = Gen.zip(valGen, Gen.choose(0, 99999))
    val cases = samples(vGen, 150)
    val df = cases.zipWithIndex.map { case ((sv, nv), i) => (i, sv, nv) }
      .toDF("id", "sv", "nv")
    val r: Templates.Resolver = n => if (Seq("sv", "nv").contains(n)) Some(col(n)) else None
    val round = df
      .withColumn("j", Templates.compile("$(format-json s=$sv n=$nv)", r))
      .withColumn("back", FieldParsers.jsonParser(col("j"), "s STRING, n STRING"))
      .select(col("id"), col("back.s"), col("back.n").cast("int"))
      .as[(Int, String, Int)].collect()
    round.foreach { case (i, s, n) =>
      assert((s, n) === (cases(i)._1, cases(i)._2))
    }
  }

  test("glob matcher ≡ java glob semantics (*, ?, literals)") {
    val globChar = Gen.frequency(6 -> Gen.alphaLowerChar, 2 -> Gen.const('*'), 2 -> Gen.const('?'))
    val globGen = Gen.listOfN(5, globChar).map(_.mkString)
    val strGen = Gen.listOfN(5, Gen.alphaLowerChar).map(_.mkString)
    val cases = samples(Gen.zip(globGen, strGen), 250)
    val df = cases.zipWithIndex.map { case ((g, s), i) => (i, g, s) }.toDF("id", "g", "s")
    // one matchGlob column per distinct glob, all evaluated in one job
    val globs = cases.map(_._1).distinct
    val withCols = globs.foldLeft(df) { (acc, g) =>
      acc.withColumn(s"m_${globs.indexOf(g)}",
        graft.filters.Filters.matchGlob(col("s"), g))
    }
    val rows = withCols.collect()
    def javaGlob(glob: String, s: String): Boolean =
      java.nio.file.FileSystems.getDefault.getPathMatcher("glob:" + glob)
        .matches(java.nio.file.Paths.get(s))
    rows.foreach { row =>
      val g = row.getAs[String]("g"); val s = row.getAs[String]("s")
      val got = row.getAs[Boolean](s"m_${globs.indexOf(g)}")
      assert(got === javaGlob(g, s), s"glob=$g s=$s")
    }
  }

  test("filter boolean algebra: router flags respect De Morgan + final exclusivity") {
    val rows = samples(Gen.zip(Gen.choose(0, 9), Gen.choose(0, 9)), 200)
    val df = rows.zipWithIndex.map { case ((a, b), i) => (i, a, b) }.toDF("id", "a", "b")
    val p = col("a") < 5
    val q = col("b") % 2 === 0
    val checked = df
      .withColumn("dm1", !(p && q) === (!p || !q))
      .withColumn("dm2", !(p || q) === (!p && !q))
      .select(bool_and(col("dm1")), bool_and(col("dm2"))).as[(Boolean, Boolean)].head()
    assert(checked === ((true, true)))
    // final-path exclusivity: flags from the Router never overlap for a
    // final path vs later paths
    val flagged = graft.routing.Router.withRouteFlags(df, Seq(
      graft.routing.RouteSpec("one", p, isFinal = true),
      graft.routing.RouteSpec("two", q),
      graft.routing.RouteSpec("fb", lit(true), isFallback = true)))
    val bad = flagged.filter(col("route_one") && col("route_two")).count()
    assert(bad === 0)
    val fbBad = flagged.filter(col("route_fb") && (col("route_one") || col("route_two"))).count()
    assert(fbBad === 0)
    // every row lands somewhere
    assert(flagged.filter(size(col("routes")) === 0).count() === 0)
  }

  test("template engine: literal round trip with $$ escaping") {
    val litGen = Gen.listOfN(12,
      Gen.frequency(8 -> Gen.alphaNumChar, 1 -> Gen.const('$'), 1 -> Gen.const(' ')))
      .map(_.mkString)
    val cases = samples(litGen, 150)
    val df = cases.zipWithIndex.map { case (s, i) => (i, s) }.toDF("id", "s")
    val evaluated = cases.zipWithIndex.map { case (s, i) =>
      // escape: literal text with $ doubled must evaluate back to itself
      val tmpl = s.replace("$", "$$")
      Templates.compile(tmpl, _ => None).as(s"t_$i")
    }
    val row = df.limit(1).select(evaluated: _*).head()
    cases.zipWithIndex.foreach { case (s, i) =>
      assert(row.getString(i) === s, s"case $i")
    }
  }

  test("numeric template functions match BigDecimal model on int inputs") {
    val cases = samples(Gen.zip(Gen.choose(-999, 999), Gen.choose(1, 999)), 150)
    val df = cases.zipWithIndex.map { case ((x, y), i) => (i, x, y) }.toDF("id", "x", "y")
    val r: Templates.Resolver = n => if (Seq("x", "y").contains(n)) Some(col(n)) else None
    val got = df.select(col("id"),
      Templates.compile("$(+ $x $y)", r), Templates.compile("$(- $x $y)", r),
      Templates.compile("$(* $x $y)", r), Templates.compile("$(max $x $y)", r))
      .as[(Int, String, String, String, String)].collect()
    got.foreach { case (i, p, m, t, mx) =>
      val (x, y) = cases(i)
      assert(p === (x + y).toString && m === (x - y).toString &&
        t === (x.toLong * y).toString && mx === math.max(x, y).toString, s"x=$x y=$y")
    }
  }

  test("pagerank: rank mass conserved (sum 1) on random digraphs with dangling nodes") {
    import graft.corpus.WebGraph
    val edgeGen = Gen.listOfN(12,
      Gen.zip(Gen.choose(0, 7), Gen.choose(0, 9))) // dst range > src range → dangling
      .map(_.filter { case (a, b) => a != b }.distinct)
    val cases = samples(edgeGen, 8).filter(_.nonEmpty)
    cases.zipWithIndex.foreach { case (es, i) =>
      val e = es.map { case (a, b) => (s"n$a", s"n$b") }.toDF("src", "dst")
      val mass = WebGraph.pagerank(e, iterations = 4)
        .agg(sum(col("rank"))).head().getDouble(0)
      assert(math.abs(mass - 1.0) < 1e-9, s"case $i: mass=$mass edges=$es")
    }
  }

  test("domainCap: never more than cap keepers in any domain, ranks dense from 1") {
    import graft.corpus.Url
    val rows = samples(Gen.zip(Gen.choose(0, 4), Gen.choose(1, 40)), 150)
      .zipWithIndex.map { case ((d, len), i) => (i.toLong, s"https://www.h$d.com/p", "x" * len) }
    val df = rows.toDF("doc_id", "url", "text")
    val got = Url.domainCap(df, col("doc_id"), col("url"),
        length(col("text")).cast("double"), cap = 7)
      .select(col("domain"), col("domain_rank"), col("cap_keeper"))
      .as[(String, Int, Boolean)].collect()
    got.groupBy(_._1).foreach { case (d, rs) =>
      assert(rs.count(_._3) === math.min(7, rs.length), s"domain $d")
      assert(rs.map(_._2).sorted.toSeq === (1 to rs.length).toSeq, s"domain $d ranks")
    }
  }

  test("containment: every score in (0,1], self-pairs absent, direction-exact on subsets") {
    import graft.corpus.Dedup
    val wordGen = Gen.oneOf("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta")
    val textGen = Gen.listOfN(10, wordGen).map(_.mkString(" "))
    val texts = samples(textGen, 20).distinct
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = Dedup.containmentPairs(df, col("doc_id"), col("text"),
        shingleK = 3, threshold = 0.1)
      .as[(Long, Long, Double)].collect()
    assert(got.forall(p => p._1 != p._2))
    assert(got.forall(p => p._3 > 0.0 && p._3 <= 1.0))
  }
}
