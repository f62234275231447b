package graft.enrich

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** geoip2() — IP geolocation enrichment (reference modules/geoip2/
  * geoip-parser.c: template-selected IP, `.geoip2` prefix default at
  * :197, value paths like country.iso_code / city.names.en /
  * location.latitude from maxminddb-helper.c).
  *
  * The reference walks a maxminddb binary tree per message. The Spark-first
  * shape is a RANGE-BUCKET BROADCAST JOIN: each CIDR range is exploded to
  * the fixed-granularity buckets it covers (default /16, `bucketBits`), the
  * bucketed dimension is broadcast, and the lookup is a plain hash
  * equi-join on `ip >> (32-bucketBits)` plus a residual start<=ip<=end
  * filter — no broadcast-nested-loop range join, which would be O(rows ×
  * ranges) and a scale-killer. Non-overlapping ranges (CIDR databases are)
  * give at most one match per row. Sizing note for a real GeoLite2-scale
  * database (~3M mostly-/16../24 ranges): /16 granularity yields ~4M bucket
  * rows ≈ tens of MB broadcast; coarser buckets shrink the dimension,
  * finer buckets sharpen the residual filter.
  */
object GeoIp {

  /** Deterministic GeoLite-shaped fixture over 10.0.0.0/8 with MIXED prefix
    * lengths (even second octet: one /16; odd: eight /24s), so the bucket
    * join is exercised on both 1-bucket and sub-bucket ranges. Pure
    * function of the row index — `rangesSql` is the same table for DuckDB.
    */
  def defaultRanges(spark: SparkSession): DataFrame = {
    val base = 167772160L // 10.0.0.0
    // country/lat derive from __i, longitude from __j — matches rangesSql
    val country =
      concat(expr("char(65 + __i % 26)"), expr("char(65 + (__i * 7) % 26)"))
    def lat(i: Column) = (i * 7 % 180 - 90).cast("double") + 0.5
    def lon(j: Column) = (j * 31 % 360 - 180).cast("double") + 0.25
    val wide = spark.range(0, 24).filter(col("id") % 2 === 0)
      .select(col("id").as("__i"), lit(0L).as("__j"))
      .select(
        (lit(base) + col("__i") * 65536L).as("net_start"),
        (lit(base) + col("__i") * 65536L + 65535L).as("net_end"),
        country.as("country_iso"),
        concat(lit("region-"), col("__i").cast("string")).as("city"),
        lat(col("__i")).as("latitude"), lon(col("__j")).as("longitude"))
    val fine = spark.range(0, 24 * 8)
      .select((col("id") / 8).cast("long").as("__i"), (col("id") % 8).as("__j"))
      .filter(col("__i") % 2 === 1)
      .select(
        (lit(base) + col("__i") * 65536L + col("__j") * 256L).as("net_start"),
        (lit(base) + col("__i") * 65536L + col("__j") * 256L + 255L).as("net_end"),
        country.as("country_iso"),
        concat(lit("city-"), col("__i").cast("string"),
          lit("-"), col("__j").cast("string")).as("city"),
        lat(col("__i")).as("latitude"), lon(col("__j")).as("longitude"))
    wide.unionByName(fine)
  }

  /** The same fixture as a DuckDB CTE body (for oracle SQL). Decimal
    * literal arithmetic is DECIMAL-typed in DuckDB — cast to double so the
    * parity schemas line up.
    */
  val rangesSql: String =
    """SELECT 167772160 + i*65536 AS net_start,
              167772160 + i*65536 + 65535 AS net_end,
              chr(CAST(65 + i%26 AS int)) || chr(CAST(65 + (i*7)%26 AS int)) AS country_iso,
              concat('region-', cast(i AS varchar)) AS city,
              CAST((i*7%180 - 90) + 0.5 AS double) AS latitude,
              CAST(-180 + 0.25 AS double) AS longitude
       FROM range(0,24) t(i) WHERE i%2 = 0
       UNION ALL
       SELECT 167772160 + i*65536 + j*256,
              167772160 + i*65536 + j*256 + 255,
              chr(CAST(65 + i%26 AS int)) || chr(CAST(65 + (i*7)%26 AS int)),
              concat('city-', cast(i AS varchar), '-', cast(j AS varchar)),
              CAST((i*7%180 - 90) + 0.5 AS double),
              CAST((j*31%360 - 180) + 0.25 AS double)
       FROM range(0,24) t(i), range(0,8) u(j) WHERE i%2 = 1"""

  /** NULL-tolerant IPv4→long: unlike Filters.ipv4ToLong (filter inputs are
    * pre-validated there), enrichment sees arbitrary text — malformed or
    * out-of-range octets yield NULL, which the left join passes through.
    */
  private[graft] def ipv4ToLongOrNull(ip: Column): Column = {
    val p = split(ip, "\\.")
    def oct(k: Int): Column = {
      val v = try_element_at(p, lit(k)).try_cast(LongType)
      when(v.between(0L, 255L), v)
    }
    when(size(p) === 4,
      oct(1) * 16777216L + oct(2) * 65536L + oct(3) * 256L + oct(4))
  }

  /** Enrich `df` with geo columns for the IPv4 address in `ip`. Output
    * columns are `<prefix>_country_iso`, `<prefix>_city`,
    * `<prefix>_latitude`, `<prefix>_longitude` — the flattened analog of
    * the reference's dotted `.geoip2.country.iso_code` names (prefix
    * default geoip-parser.c:197; underscores because dots in top-level
    * column names fight Spark's field-path resolution). Unmatched or
    * unparseable IPs get NULLs (the reference leaves the fields unset).
    */
  def enrich(df: DataFrame, ip: Column, ranges: DataFrame,
      prefix: String = "geoip2", bucketBits: Int = 16): DataFrame = {
    require(bucketBits >= 1 && bucketBits <= 32, s"bucketBits out of range: $bucketBits")
    val shiftBy = 32 - bucketBits
    val attrs = ranges.columns.filterNot(Set("net_start", "net_end"))
    val buckets = ranges.select(
      explode(sequence(shiftright(col("net_start"), shiftBy),
        shiftright(col("net_end"), shiftBy))).as("__bucket"),
      col("net_start").as("__start"), col("net_end").as("__end"),
      struct(attrs.map(col): _*).as("__geo"))
    val ipNum = ipv4ToLongOrNull(ip)
    df.withColumn("__ipnum", ipNum)
      .join(broadcast(buckets),
        shiftright(col("__ipnum"), shiftBy) === col("__bucket") &&
          col("__ipnum") >= col("__start") && col("__ipnum") <= col("__end"),
        "left")
      .select(df.columns.map(col) ++
        attrs.map(a => col("__geo")(a).as(s"${prefix}_$a")): _*)
  }

  // ---- template-function form: $(geoip2 …) -------------------------------

  /** Reference dotted entry paths (maxminddb-helper.c's known selectors) →
    * this module's flattened attribute names. Flattened names are accepted
    * as-is too. */
  private val FieldAliases = Map(
    "country.iso_code" -> "country_iso",
    "city.names.en" -> "city",
    "location.latitude" -> "latitude",
    "location.longitude" -> "longitude")

  private def resolveField(field: String, attrs: Set[String]): String = {
    val f = FieldAliases.getOrElse(field, field)
    require(attrs(f),
      s"$$(geoip2): unknown field '$field' (have: ${attrs.toSeq.sorted.mkString(", ")})")
    f
  }

  /** Driver-side twin of [[defaultRanges]] (same rows, values pre-rendered
    * as strings) — the template-function form's default database, the
    * analog of the reference's `mmdb_default_database()` fallback
    * (tfgeoip.c:81). */
  lazy val defaultRangesLocal: Seq[(Long, Long, Map[String, String])] = {
    val base = 167772160L
    def country(i: Int) = "" + ('A' + i % 26).toChar + ('A' + (i * 7) % 26).toChar
    def lat(i: Int) = (i * 7 % 180 - 90) + 0.5
    def lon(j: Int) = (j * 31 % 360 - 180) + 0.25
    val wide = (0 until 24).filter(_ % 2 == 0).map { i =>
      (base + i * 65536L, base + i * 65536L + 65535L, Map(
        "country_iso" -> country(i), "city" -> s"region-$i",
        "latitude" -> lat(i).toString, "longitude" -> lon(0).toString))
    }
    val fine = for { i <- 0 until 24 if i % 2 == 1; j <- 0 until 8 } yield
      (base + i * 65536L + j * 256L, base + i * 65536L + j * 256L + 255L, Map(
        "country_iso" -> country(i), "city" -> s"city-$i-$j",
        "latitude" -> lat(i).toString, "longitude" -> lon(j).toString))
    wide ++ fine
  }

  /** Driver-side CSV database for `$(geoip2 --database file.csv …)`:
    * header `net_start,net_end,<attr>,…`, plain commas (fixture format —
    * a production mmdb would ship pre-bucketed parquet through [[enrich]]
    * instead). */
  def loadRangesLocal(path: String): Seq[(Long, Long, Map[String, String])] = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    val lines = try src.getLines().filter(_.nonEmpty).toVector finally src.close()
    require(lines.nonEmpty, s"$$(geoip2): empty database $path")
    val hdr = lines.head.split(",", -1)
    require(hdr.length >= 3 && hdr(0) == "net_start" && hdr(1) == "net_end",
      s"$$(geoip2): database header must be net_start,net_end,<attr>…, got ${lines.head}")
    lines.tail.map { l =>
      val p = l.split(",", -1)
      (p(0).toLong, p(1).toLong, hdr.drop(2).zip(p.drop(2)).toMap)
    }
  }

  /** The per-row lookup COLUMN behind the `$(geoip2)` template function:
    * the database inlines into the plan as a literal bucket map (the
    * expression analog of the reference mapping the whole mmdb into every
    * process, tfgeoip.c:44) and the row pays one map probe + a residual
    * range filter. Right for config compatibility and fixture/metadata-
    * sized databases; a GeoLite-scale table belongs in the parser form
    * ([[enrich]]'s broadcast bucket join), not in the plan. Misses and
    * unparseable IPs render as "" (the reference appends nothing on
    * error, tfgeoip.c:149).
    */
  def lookupColumn(
      ip: Column, ranges: Seq[(Long, Long, Map[String, String])],
      field: String = "country.iso_code", bucketBits: Int = 16): Column =
    if (ranges.isEmpty) lit("")
    else {
      val attr = resolveField(field, ranges.head._3.keySet)
      val shiftBy = 32 - bucketBits
      val byBucket = ranges
        .flatMap { case (s, e, m) =>
          ((s >> shiftBy) to (e >> shiftBy)).map(b => b -> ((s, e, m.getOrElse(attr, ""))))
        }
        .groupBy(_._1).toSeq.sortBy(_._1)
      val mapCol = map(byBucket.flatMap { case (b, rs) =>
        Seq(lit(b), array(rs.map { case (_, (s, e, v)) =>
          struct(lit(s).as("s"), lit(e).as("e"), lit(v).as("v"))
        }: _*))
      }: _*)
      val ipn = ipv4ToLongOrNull(ip)
      val hits = filter(try_element_at(mapCol, shiftright(ipn, shiftBy)),
        r => r("s") <= ipn && r("e") >= ipn)
      coalesce(when(size(hits) > 0, element_at(hits, 1)("v")), lit(""))
    }
}
