package graft.corpus

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** robots.txt parsing + URL fetch-policy evaluation — the compliance
  * check that decides whether a crawler may fetch a URL at all (RFC
  * 9309). Sits in front of the WARC ingestion tier the way the
  * [[HtmlText]] meta-robots signals sit behind it.
  *
  * Declared subset (documented, both engines implement it identically):
  * prefix-match paths only (no `*`/`$` wildcards), group selection is
  * "agent-specific groups if the domain has any for this agent, else the
  * `*` groups" (RFC picks the longest agent-substring match; single
  * known-agent deployments collapse to this), and empty-value
  * `Allow:`/`Disallow:` lines are no-ops (per RFC an empty Disallow
  * disallows nothing — modeling it as an empty-prefix rule would
  * instead match EVERYTHING).
  *
  * Scale shape: parsing is per-domain work (lines explode, two windows
  * keyed by domain — robots files are KB-sized, groups are bounded);
  * [[allowed]] joins the corpus's URLs against the BROADCAST rule table
  * (rules are domain-sized, never corpus-sized) and resolves the winner
  * with one combinable max(struct) — longest matching path wins, ties go
  * to allow (the RFC tiebreak).
  */
object Robots {

  /** Parse robots.txt bodies into one row per (domain, agent, rule,
    * path). Consecutive `User-agent:` lines share one group (RFC 9309
    * §2.1); a rule line belongs to the most recent group; rules before
    * any group, and empty-value rules, are dropped. `specificity` =
    * length(path), the match-resolution key. */
  def parse(robots: DataFrame, domain: Column, txt: Column): DataFrame = {
    val lines = robots
      .select(domain.as("domain"), posexplode(split(txt, "\n")).as(Seq("ln", "line")))
    val noComment = trim(regexp_replace(col("line"), "#.*$", ""))
    val kind = when(lower(noComment).startsWith("user-agent:"), "ua")
      .when(lower(noComment).startsWith("allow:"), "allow")
      .when(lower(noComment).startsWith("disallow:"), "disallow")
      .otherwise("")
    val value = trim(regexp_extract(noComment, "^[^:]*:(.*)$", 1))
    val rel = lines
      .withColumn("kind", kind)
      .withColumn("value", value)
      .where(col("kind") =!= "")
    val w = Window.partitionBy(col("domain")).orderBy(col("ln"))
    val grouped = rel
      .withColumn("__newg",
        when(col("kind") === "ua" &&
          coalesce(lag(col("kind"), 1).over(w), lit("")) =!= "ua", 1)
          .otherwise(0))
      .withColumn("grp", sum(col("__newg")).over(w))
    val agents = grouped.where(col("kind") === "ua")
      .select(col("domain"), col("grp"), lower(col("value")).as("agent"))
    val rules = grouped
      .where(col("kind") =!= "ua" && col("value") =!= "")
      .select(col("domain"), col("grp"), col("kind").as("rule"),
        col("value").as("path"))
    agents.join(rules, Seq("domain", "grp"))
      .select(col("domain"), col("agent"), col("rule"), col("path"),
        length(col("path")).as("specificity"))
  }

  /** Evaluate fetch policy for every URL: (id, domain, path, allowed).
    * Agent-specific groups shadow `*` groups per domain; longest matching
    * path wins, allow beats disallow on ties; no matching rule (or no
    * robots at all) → allowed. */
  def allowed(
      urls: DataFrame, id: Column, domain: Column, path: Column,
      rules: DataFrame, agent: String): DataFrame = {
    val ag = agent.toLowerCase
    val r = rules.where(col("agent").isin(ag, "*"))
      .select(col("domain").as("__rd"), col("agent").as("__ra"),
        col("rule"), col("path").as("__rp"))
    val hasAgent = r.where(col("__ra") === ag)
      .select(col("__rd")).distinct().withColumn("__has", lit(true))
    val eff = r.join(hasAgent, Seq("__rd"), "left")
      .where(when(coalesce(col("__has"), lit(false)), col("__ra") === ag)
        .otherwise(col("__ra") === "*"))
    val u = urls.select(id.as("id"), domain.as("domain"), path.as("path"))
    u.join(broadcast(eff),
        col("domain") === col("__rd") && col("path").startsWith(col("__rp")),
        "left")
      .groupBy(col("id"), col("domain"), col("path"))
      .agg(max(when(col("__rp").isNotNull,
        struct(length(col("__rp")).as("l"),
          (col("rule") === "allow").cast("int").as("a")))).as("__w"))
      .select(col("id"), col("domain"), col("path"),
        coalesce(col("__w").getField("a") === 1, lit(true)).as("allowed"))
  }
}
