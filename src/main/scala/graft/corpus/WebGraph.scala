package graft.corpus

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Web-graph construction + link-based document importance — the ranking
  * signal web-scale corpus pipelines attach to every page (Common Crawl
  * publishes per-domain ranks computed from its own hyperlink graph;
  * WebText/OpenWebText-style curation keeps pages whose source carries
  * enough inbound reputation). PageRank: Brin & Page 1998, "The anatomy
  * of a large-scale hypertextual Web search engine", §2.1.
  *
  * Three stages, each independently usable:
  *
  *  1. [[links]]/[[linkHost]] — href extraction + per-link destination
  *     host resolution, pure scan-stage column expressions over the raw
  *     HTML (composes with [[HtmlText]], which already sentinel-marks the
  *     same anchors for link-density);
  *  2. [[domainEdges]] — the distinct registrable-domain edge list. At
  *     100 TB the explode is narrow per-row work and the only shuffle is
  *     the distinct over (src, dst) — edge-count-sized, not corpus-sized;
  *  3. [[pagerank]] — fixed-iteration power method with uniform
  *     dangling-mass redistribution. Each iteration is one shuffle join
  *     (edges ⋈ ranks on src) + one combinable sum by dst, both sized by
  *     the GRAPH (domains), not the corpus. Ranks are localCheckpoint'd
  *     per round so the plan does not grow with the iteration count; the
  *     dangling mass is a one-double aggregate collected with `.head()`
  *     and inlined as a literal (never a scalar crossJoin — see the
  *     BroadcastNestedLoopJoin rule in CLAUDE.md).
  *
  * [[importance]] then joins the domain rank back onto documents as a
  * curation signal — the domain table is graph-sized, so the join is an
  * explicit broadcast: the corpus never shuffles to pick up its ranks.
  */
object WebGraph {

  /** href values of all anchor tags, in document order. Extraction uses a
    * capture GROUP (index 1) — extraction-group indexing is portable
    * between java.util.regex and RE2/DuckDB; only REPLACEMENT syntax
    * (`$1` vs `\1`) is dialect-split (see Url.canonicalize's rule).
    * Double-quoted hrefs only: the deterministic-fixture subset; a real
    * crawl front door would add the single-quote/bare variants as two
    * more alternations. */
  val HrefRe = "(?i)<a\\b[^>]*?href\\s*=\\s*\"([^\"]*)\""

  def links(html: Column): Column = regexp_extract_all(html, lit(HrefRe), lit(1))

  /** Destination host of one href in the context of the page URL:
    * absolute links carry their own host, protocol-relative links (`//h/p`)
    * inherit the scheme only, and everything else (path-relative,
    * fragment, query-only) stays on the page's host. */
  def linkHost(pageUrl: Column, href: Column): Column =
    when(href.rlike("(?i)^https?://"), Url.host(href))
      .when(href.startsWith("//"), Url.host(concat(lit("http:"), href)))
      .otherwise(Url.host(pageUrl))

  /** Registrable-domain key — shared with the blocklist/cap operators. */
  def registrableDomain(h: Column): Column = Url.registrableDomain(h)

  /** Whole anchor elements (`<a …href…>…</a>`), innermost-match, in
    * document order — the unit [[anchorTexts]] splits into (href, text). */
  val AnchorRe = "(?is)<a\\b[^>]*?href\\s*=\\s*\"[^\"]*\"[^>]*>.*?</a\\s*>"

  /** One row per anchor: the link's destination registrable domain + the
    * anchor's visible text (inner tags stripped, whitespace collapsed) —
    * the classic aggregated-anchor-text signal (retrieval and pretraining
    * corpora attach "what the web calls this page" to every target;
    * anchors are also the raw material for query–document pairs). Pure
    * scan-stage work: extract anchors, per-anchor regex splits, explode.
    * Empty anchor texts and self-domain links are dropped. */
  def anchorTexts(docs: DataFrame, pageUrl: Column, html: Column): DataFrame =
    docs.select(
        registrableDomain(Url.host(pageUrl)).as("src"),
        explode(regexp_extract_all(html, lit(AnchorRe), lit(0))).as("__a"))
      .select(col("src"),
        registrableDomain(linkHost(lit(""),
          regexp_extract(col("__a"), HrefRe, 1))).as("dst"),
        trim(regexp_replace(regexp_replace(col("__a"),
          "(?is)<[^>]*>", " "), "\\s+", " ")).as("anchor"))
      .where(col("dst") =!= "" && col("dst") =!= col("src") &&
        col("anchor") =!= "")
      .select(col("dst"), col("anchor"))

  /** Top-k anchor texts per destination domain by frequency (ties → the
    * lexicographically first anchor, deterministic). One combinable count
    * keyed (dst, anchor), then one window over the COUNTED rows — the
    * window's partition is bounded by a domain's distinct anchor
    * vocabulary, never by its raw in-link count (a 10⁸-in-link page with
    * 40 distinct anchor phrasings is 40 rows here). */
  def topAnchors(anchors: DataFrame, k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counted = anchors.groupBy(col("dst"), col("anchor"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("dst"))
      .orderBy(col("n").desc, col("anchor").asc)
    counted.withColumn("anchor_rank", row_number().over(w))
      .where(col("anchor_rank") <= k)
  }

  /** Distinct registrable-domain edge list (src → dst) from the corpus's
    * pages: explode extracted hrefs, resolve each destination host,
    * collapse both ends to registrable domains, drop self-loops and
    * non-URLs. Output columns: `src`, `dst`. */
  def domainEdges(docs: DataFrame, pageUrl: Column, html: Column): DataFrame = {
    val withSrc = docs.select(
      registrableDomain(Url.host(pageUrl)).as("src"),
      links(html).as("__hrefs"))
    withSrc
      .select(col("src"), explode(col("__hrefs")).as("__href"))
      .select(col("src"),
        registrableDomain(linkHost(lit(""), col("__href"))).as("dst0"))
      // relative links resolve against pageUrl, but src IS pageUrl's
      // domain — so an empty resolved host means "same domain" = self-loop
      .where(col("dst0") =!= "" && col("dst0") =!= col("src"))
      .select(col("src"), col("dst0").as("dst"))
      .distinct()
  }

  /** PageRank over an edge list, fixed iteration count, uniform
    * dangling-mass redistribution. Input `edges` must be distinct
    * (src, dst) pairs without self-loops; output is one row per node with
    * its final `rank` (ranks sum to 1 every iteration — the dangling
    * redistribution keeps the distribution a distribution, which
    * WebGraphSpec pins as an invariant).
    *
    * rank₀(v) = 1/N;
    * rankₜ₊₁(v) = (1−d)/N + d·( Σ_{u→v} rankₜ(u)/outdeg(u) + Dₜ/N )
    * where Dₜ = Σ rankₜ(u) over nodes with no out-edges.
    */
  def pagerank(
      edges: DataFrame,
      iterations: Int = 3,
      damping: Double = 0.85): DataFrame = {
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node")))
      .distinct()
      .persist()
    val n = nodes.count().toDouble
    val outdeg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val e = edges.join(outdeg, Seq("src")).persist()
    val srcs = e.select(col("src").as("node")).distinct().persist()

    var ranks = nodes.select(col("node"), lit(1.0 / n).as("rank"))
    for (_ <- 1 to iterations) {
      val danglingRow = ranks.join(srcs, Seq("node"), "left_anti")
        .agg(sum(col("rank"))).head()
      val dangling = if (danglingRow.isNullAt(0)) 0.0 else danglingRow.getDouble(0)
      val contribs = e.join(ranks, e("src") === ranks("node"))
        .groupBy(col("dst").as("node"))
        .agg(sum(col("rank") / col("outdeg")).as("in_rank"))
      ranks = nodes.join(contribs, Seq("node"), "left")
        .select(col("node"),
          (lit((1.0 - damping) / n) + lit(damping) *
            (coalesce(col("in_rank"), lit(0.0)) + lit(dangling / n))).as("rank"))
        .localCheckpoint()
    }
    nodes.unpersist()
    e.unpersist()
    srcs.unpersist()
    ranks
  }

  /** Join the domain rank back onto documents as a per-doc importance
    * signal. `ranks` is graph-sized (one row per registrable domain), so
    * the join is an explicit broadcast — the corpus side never shuffles.
    * Documents whose domain has no rank (never seen in the graph) get 0. */
  def importance(
      docs: DataFrame, id: Column, pageUrl: Column,
      ranks: DataFrame): DataFrame =
    docs.select(id.as("doc_id"),
        registrableDomain(Url.host(pageUrl)).as("domain"))
      .join(broadcast(ranks.withColumnRenamed("node", "domain")),
        Seq("domain"), "left")
      .select(col("doc_id"), col("domain"),
        coalesce(col("rank"), lit(0.0)).as("importance"))
}
