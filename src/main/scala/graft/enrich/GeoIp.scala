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
  private def ipv4ToLongOrNull(ip: Column): Column = {
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
}
