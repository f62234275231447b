package graft

import org.apache.spark.sql.functions._

import graft.config.{Compiler, Dsl}
import graft.config.Dsl._

/** Config DSL → single-plan compilation, porting the semantics of the
  * reference's logpath e2e suites (tests/light/functional_tests/logpath/:
  * test_flags_final.py, test_flags_fallback.py, test_flags_catch_all.py,
  * test_conditionals.py): exact per-destination routed-row expectations.
  */
class ConfigSpec extends SparkSpec {
  import spark.implicits._

  private def src(rows: (String, String)*) = { (s: org.apache.spark.sql.SparkSession) =>
    import s.implicits._
    rows.toSeq.toDF("host", "msg")
  }

  private def routed(c: Compiler.Compiled, dest: String): Set[String] =
    c.sink(dest).select("msg").as[String].collect().toSet

  test("final: matched rows stop propagating to later paths") {
    val cfg = Config(
      sources = Map(
        "s1" -> src(("A", "a1"), ("B", "b1")),
        "s2" -> src(("A", "a2"))),
      paths = Seq(
        LogPath(Seq("s1"), Seq(
          FilterE(_ => col("host") === "A"), DestE("d_final")), isFinal = true),
        LogPath(Seq("s1", "s2"), Seq(DestE("d_rest")))))
    val c = Compiler.compile(spark, cfg)
    assert(routed(c, "d_final") === Set("a1"))
    // a1 was consumed by the final path; b1 unmatched there, a2 not in s1
    assert(routed(c, "d_rest") === Set("b1", "a2"))
  }

  test("fallback: only rows matched by no non-fallback path") {
    val cfg = Config(
      sources = Map("s1" -> src(("A", "a1"), ("B", "b1"), ("C", "c1"))),
      paths = Seq(
        LogPath(Seq("s1"), Seq(FilterE(_ => col("host") === "A"), DestE("d_a"))),
        LogPath(Seq("s1"), Seq(FilterE(_ => col("host") === "B"), DestE("d_b"))),
        LogPath(Seq("s1"), Seq(DestE("d_fb")), isFallback = true)))
    val c = Compiler.compile(spark, cfg)
    assert(routed(c, "d_a") === Set("a1"))
    assert(routed(c, "d_b") === Set("b1"))
    assert(routed(c, "d_fb") === Set("c1"))
  }

  test("catch-all: receives every source, does not mark rows as matched") {
    val cfg = Config(
      sources = Map("s1" -> src(("A", "a1")), "s2" -> src(("B", "b2"))),
      paths = Seq(
        LogPath(Seq("s1"), Seq(DestE("d_all")), isCatchAll = true),
        LogPath(Seq("s1"), Seq(FilterE(_ => col("host") === "A"), DestE("d_a"))),
        LogPath(Seq("s1", "s2"), Seq(DestE("d_fb")), isFallback = true)))
    val c = Compiler.compile(spark, cfg)
    assert(routed(c, "d_all") === Set("a1", "b2")) // both sources
    assert(routed(c, "d_a") === Set("a1"))
    assert(routed(c, "d_fb") === Set("b2")) // catch-all delivery didn't count as match
  }

  test("if/elif/else: exclusive branch ladder inside one path") {
    val cfg = Config(
      sources = Map("s1" -> src(("A", "a1"), ("B", "b1"), ("C", "c1"))),
      paths = Seq(
        LogPath(Seq("s1"), Seq(
          IfElse(
            branches = Seq(
              ((_: org.apache.spark.sql.DataFrame) => col("host") === "A") -> Seq(DestE("d_if")),
              ((_: org.apache.spark.sql.DataFrame) => col("host") === "B") -> Seq(DestE("d_elif"))),
            otherwise = Seq(DestE("d_else")))))))
    val c = Compiler.compile(spark, cfg)
    assert(routed(c, "d_if") === Set("a1"))
    assert(routed(c, "d_elif") === Set("b1"))
    assert(routed(c, "d_else") === Set("c1"))
  }

  test("junction: parallel channels rejoined; transforms visible downstream") {
    val cfg = Config(
      sources = Map("s1" -> src(("A", "a1"), ("B", "b1"))),
      paths = Seq(
        LogPath(Seq("s1"), Seq(
          TransformE(df => df.withColumn("up", upper(col("msg")))),
          Junction(Seq(
            Seq(FilterE(_ => col("host") === "A"), DestE("d_ch1")),
            Seq(DestE("d_ch2")))),
          DestE("d_after")))))
    val c = Compiler.compile(spark, cfg)
    assert(routed(c, "d_ch1") === Set("a1"))
    assert(routed(c, "d_ch2") === Set("a1", "b1"))
    assert(routed(c, "d_after") === Set("a1", "b1"))
    assert(c.sink("d_ch1").select("up").as[String].collect().toSet === Set("A1"))
  }

  // reference tests/light/functional_tests/logpath/test_conditionals.py:
  // a rewrite inside a branch applies only to messages that entered it
  test("rewrite inside an if branch mutates only rows that entered it") {
    val cfg = Config(
      sources = Map("s1" -> src(("A", "a1"), ("B", "b1"))),
      paths = Seq(
        LogPath(Seq("s1"), Seq(
          IfElse(
            branches = Seq(
              ((_: org.apache.spark.sql.DataFrame) => col("host") === "A") -> Seq(
                TransformE(df => df.withColumn("msg", concat(col("msg"), lit("-rw")))),
                DestE("d_if"))),
            otherwise = Seq(DestE("d_else")))))))
    val c = Compiler.compile(spark, cfg)
    assert(routed(c, "d_if") === Set("a1-rw"))
    assert(routed(c, "d_else") === Set("b1")) // else-rows untouched
  }

  test("filter is frozen at its position: a later rewrite cannot flip it") {
    val cfg = Config(
      sources = Map("s1" -> src(("A", "a1"), ("B", "b1"))),
      paths = Seq(
        LogPath(Seq("s1"), Seq(
          FilterE(_ => col("host") === "A"),
          TransformE(df => df.withColumn("host", lit("Z"))),
          DestE("d_a")))))
    val c = Compiler.compile(spark, cfg)
    assert(routed(c, "d_a") === Set("a1")) // verdict predates the rewrite
    assert(c.sink("d_a").select("host").as[String].collect().toSet === Set("Z"))
  }

  test("transform after a filter leaves non-matching rows intact") {
    val cfg = Config(
      sources = Map("s1" -> src(("A", "a1"), ("B", "b1"))),
      paths = Seq(
        LogPath(Seq("s1"), Seq(
          FilterE(_ => col("host") === "A"),
          TransformE(df => df.withColumn("msg", upper(col("msg")))),
          DestE("d_a"))),
        LogPath(Seq("s1"), Seq(FilterE(_ => col("host") === "B"), DestE("d_b")))))
    val c = Compiler.compile(spark, cfg)
    assert(routed(c, "d_a") === Set("A1"))
    assert(routed(c, "d_b") === Set("b1")) // sibling path's rows untouched
  }

  test("drop-unmatched: rows routed nowhere are dropped") {
    val cfg = Config(
      sources = Map("s1" -> src(("A", "a1"), ("B", "b1"))),
      paths = Seq(
        LogPath(Seq("s1"), Seq(FilterE(_ => col("host") === "A"), DestE("d_a")))))
    val c = Compiler.compile(spark, cfg)
    assert(c.dropUnmatched.select("msg").as[String].collect().toSet === Set("a1"))
  }
}
