package graft

import org.apache.spark.sql.functions._

import graft.corpus.{Url, WebGraph}

/** Web-graph tier: href extraction, link-host resolution, domain edge
  * list, PageRank invariants, per-domain quota cap.
  */
class WebGraphSpec extends SparkSpec {
  import spark.implicits._

  test("links: hrefs extracted in document order, double-quoted only") {
    val d = Seq(
      ("""<a href="https://a.com/x">A</a> text <A HREF="/rel">B</A><a data-x="1" href="#f">C</a>""",
        Seq("https://a.com/x", "/rel", "#f")),
      ("no anchors here", Seq.empty[String])).toDF("h", "want")
    val got = d.select(WebGraph.links(col("h")).as("got"), col("want"))
      .as[(Seq[String], Seq[String])].collect()
    got.foreach { case (g, w) => assert(g === w) }
  }

  test("linkHost: absolute / protocol-relative / page-relative resolution") {
    val d = Seq(
      ("https://www.Page.com/p", "https://Other.ORG/x", "other.org"),
      ("https://www.page.com/p", "//cdn.example.net/y", "cdn.example.net"),
      ("https://www.page.com/p", "/relative", "www.page.com"),
      ("https://www.page.com/p", "#frag", "www.page.com"),
      ("https://user@www.page.com:8443/p", "?q=1", "www.page.com"))
      .toDF("page", "href", "want")
    val got = d.select(
      WebGraph.linkHost(col("page"), col("href")).as("got"), col("want"))
      .as[(String, String)].collect()
    got.foreach { case (g, w) => assert(g === w) }
  }

  test("domainEdges: registrable collapse, self-loops and relatives dropped, distinct") {
    val html =
      """<a href="https://b.deep.other.org/1">x</a><a href="/self">y</a>""" +
        """<a href="https://www.other.org/2">z</a><a href="https://mysite.com/3">w</a>"""
    val d = Seq(
      ("https://www.mysite.com/a", html),
      ("https://www.mysite.com/b", html)).toDF("url", "h")
    val got = WebGraph.domainEdges(d, col("url"), col("h"))
      .as[(String, String)].collect().toSet
    // both other.org links collapse to ONE edge; the self-domain absolute
    // link and the path-relative link are self-loops and vanish; two pages
    // on the same domain dedup to one edge row
    assert(got === Set(("mysite.com", "other.org")))
  }

  test("pagerank: hand-computed two-node chain, one iteration") {
    // a -> b, N=2: r0 = (1/2, 1/2); dangling D0 = rank(b) = 1/2
    // r1(a) = 0.15/2 + 0.85*(0 + 0.25)   = 0.2875
    // r1(b) = 0.15/2 + 0.85*(0.5 + 0.25) = 0.7125
    val e = Seq(("a", "b")).toDF("src", "dst")
    val got = WebGraph.pagerank(e, iterations = 1, damping = 0.85)
      .as[(String, Double)].collect().toMap
    assert(math.abs(got("a") - 0.2875) < 1e-12)
    assert(math.abs(got("b") - 0.7125) < 1e-12)
  }

  test("pagerank: ranks stay a distribution (sum 1) with dangling nodes present") {
    // c and d are dangling (no out-edges) — the redistribution keeps mass 1
    val e = Seq(("a", "b"), ("a", "c"), ("b", "c"), ("b", "d"))
      .toDF("src", "dst")
    for (k <- Seq(1, 3, 7)) {
      val sum = WebGraph.pagerank(e, iterations = k)
        .agg(org.apache.spark.sql.functions.sum(col("rank"))).head().getDouble(0)
      assert(math.abs(sum - 1.0) < 1e-9, s"iterations=$k sum=$sum")
    }
  }

  test("pagerank: inbound reputation ranks the sink above its feeders") {
    // star: 4 sources all link to hub; hub is dangling
    val e = Seq(("s1", "hub"), ("s2", "hub"), ("s3", "hub"), ("s4", "hub"))
      .toDF("src", "dst")
    val got = WebGraph.pagerank(e, iterations = 5).as[(String, Double)]
      .collect().toMap
    assert(got("hub") > got("s1") * 2)
  }

  test("importance: broadcast join back onto docs; unseen domain gets 0") {
    val docs = Seq((1L, "https://www.a.com/p"), (2L, "https://nowhere.io/p"))
      .toDF("doc_id", "url")
    val ranks = Seq(("a.com", 0.7), ("b.com", 0.3)).toDF("node", "rank")
    val got = WebGraph.importance(docs, col("doc_id"), col("url"), ranks)
      .as[(Long, String, Double)].collect()
      .map { case (id, _, imp) => id -> imp }.toMap
    assert(got(1L) === 0.7 && got(2L) === 0.0)
  }

  test("anchorTexts: inner tags stripped, whitespace collapsed, self/relative/empty dropped") {
    val html =
      """<a href="https://www.other.org/1">Read <b>the</b>
        |  article</a><a href="/rel">Nav</a><a href="https://mysite.com/x">self</a>""".stripMargin +
        """<a href="https://third.net/y"><img src="i.png"/></a>"""
    val d = Seq(("https://www.mysite.com/a", html)).toDF("url", "h")
    val got = WebGraph.anchorTexts(d, col("url"), col("h"))
      .as[(String, String)].collect().toSet
    // the image-only anchor strips to empty and is dropped; the multiline
    // bold anchor collapses to one clean phrase
    assert(got === Set(("other.org", "Read the article")))
  }

  test("topAnchors: frequency rank with lexicographic ties, cutoff at k") {
    val a = Seq(
      ("t.org", "beta"), ("t.org", "beta"), ("t.org", "alpha"), ("t.org", "alpha"),
      ("t.org", "gamma"), ("t.org", "delta"),
      ("u.net", "only")).toDF("dst", "anchor")
    val got = WebGraph.topAnchors(a, k = 3)
      .select("dst", "anchor", "n", "anchor_rank")
      .as[(String, String, Long, Int)].collect().toSet
    assert(got === Set(
      ("t.org", "alpha", 2L, 1), ("t.org", "beta", 2L, 2), ("t.org", "delta", 1L, 3),
      ("u.net", "only", 1L, 1)))
  }

  test("domainCap: at most cap keepers per domain, best-first, ties by id") {
    val docs = (0 until 40).map { i =>
      (i.toLong, s"https://www.host${i % 2}.com/p/$i", "x" * (i % 5 + 1))
    }.toDF("doc_id", "url", "text")
    val got = Url.domainCap(docs, col("doc_id"), col("url"),
      length(col("text")).cast("double"), cap = 3)
    val keepers = got.where(col("cap_keeper"))
      .select("domain", "doc_id").as[(String, Long)].collect()
    assert(keepers.groupBy(_._1).forall(_._2.length == 3))
    // host0.com holds even ids; longest texts are i%5==4 -> ids 4,14,24,34;
    // best-first with id tiebreak keeps 4,14,24 (length ties break low-id)
    assert(keepers.filter(_._1 == "host0.com").map(_._2).sorted === Seq(4L, 14L, 24L))
    // rank within domain is dense 1..n
    val ranks = got.where(col("domain") === "host0.com")
      .select("domain_rank").as[Int].collect().sorted
    assert(ranks === (1 to 20).toArray)
  }
}
