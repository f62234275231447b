package graft

import org.apache.spark.sql.functions._

import graft.operators.Patternize

/** SLCT pattern mining — membership/support table ported from the
  * reference's modules/correlation/tests/test_patternize.c
  * (test_find_clusters_slct + test_frequent_words).
  */
class PatternizeSpec extends SparkSpec {
  import spark.implicits._

  /** cluster → (support, member ids) for a small log fixture. */
  private def clustersOf(logs: Seq[String], support: Int): Map[String, (Long, Set[Int])] = {
    val df = logs.zipWithIndex.map { case (t, i) => (i, t) }.toDF("id", "text")
    val asg = Patternize.assign(df, col("id"), col("text"), support)
    val cl = Patternize.clusters(df, col("id"), col("text"), support)
    cl.join(asg.filter(col("is_candidate")), "pattern")
      .select("pattern", "n_msgs", "member_id")
      .collect()
      .groupBy(_.getString(0))
      .map { case (p, rows) =>
        p -> ((rows.head.getLong(1), rows.map(_.getInt(2)).toSet))
      }
  }

  test("find_clusters_slct: membership and support (test_patternize.c)") {
    assert(clustersOf(Seq("a"), 0).values.toSet === Set((1L, Set(0))))
    assert(clustersOf(Seq("a", "b"), 0).values.toSet ===
      Set((1L, Set(0)), (1L, Set(1))))
    assert(clustersOf(Seq("a", "b", "a", "b"), 2).values.toSet ===
      Set((2L, Set(0, 2)), (2L, Set(1, 3))))
    // support 1: four distinct lines → four singleton clusters
    assert(clustersOf(Seq("alma korte korte alma", "alma korte", "bela korte", "alma"), 1)
      .values.toSet === Set((1L, Set(0)), (1L, Set(1)), (1L, Set(2)), (1L, Set(3))))
    val seven = Seq(
      "alma korte", "alma korte", "alma korte", "alma korte",
      "bela korte", "bela korte", "alma")
    assert(clustersOf(seven, 2).values.toSet ===
      Set((4L, Set(0, 1, 2, 3)), (2L, Set(4, 5))))
    assert(clustersOf(seven, 3).values.toSet === Set((4L, Set(0, 1, 2, 3))))
    // infrequent positions wildcard out
    val asdf = Seq(
      "alma korte asdf1 labda", "alma korte asdf2 labda",
      "alma korte asdf3 labda", "sallala")
    val got = clustersOf(asdf, 3)
    assert(got === Map("alma korte @ labda" -> ((3L, Set(0, 1, 2)))))
    val qwe = Seq(
      "alma korte asdf1 labda qwe1", "alma korte asdf2 labda qwe2",
      "alma korte asdf3 labda qwe3", "sallala")
    assert(clustersOf(qwe, 3) === Map("alma korte @ labda @" -> ((3L, Set(0, 1, 2)))))
  }

  test("frequent_words counts (test_patternize.c test_frequent_words)") {
    def freq(logs: Seq[String], support: Int): Map[(Int, String), Long] = {
      val df = logs.toDF("text")
      Patternize.frequentWords(df, col("text"), support)
        .collect().map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap
    }
    assert(freq(Seq("a"), 0) === Map((0, "a") -> 1L))
    assert(freq(Seq("a b"), 0) === Map((0, "a") -> 1L, (1, "b") -> 1L))
    assert(freq(Seq("a a", "b b"), 0) ===
      Map((0, "a") -> 1L, (1, "a") -> 1L, (0, "b") -> 1L, (1, "b") -> 1L))
    assert(freq(Seq("a b", "a b"), 0) === Map((0, "a") -> 2L, (1, "b") -> 2L))
    assert(freq(Seq("a b", "a b", "a c"), 2) === Map((0, "a") -> 3L, (1, "b") -> 2L))
  }
}
