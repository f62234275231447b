package graft.model

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Facility/severity name tables per RFC 5424 / BSD syslog (the reference
  * keeps the same tables in lib/syslog-names.c). `pri = facility * 8 +
  * severity`; macros FACILITY/SEVERITY/LEVEL render the symbolic names
  * (reference lib/template/macros.c pri family).
  *
  * Implemented as codegen-friendly Column expressions: `element_at` over an
  * array literal — no UDF, stays inside whole-stage codegen.
  */
object SyslogNames {

  val facilities: Seq[String] = Seq(
    "kern", "user", "mail", "daemon", "auth", "syslog", "lpr", "news",
    "uucp", "cron", "authpriv", "ftp", "ntp", "security", "console",
    "solaris-cron", "local0", "local1", "local2", "local3", "local4",
    "local5", "local6", "local7")

  val severities: Seq[String] = Seq(
    "emerg", "alert", "crit", "err", "warning", "notice", "info", "debug")

  val facilityByName: Map[String, Int] = facilities.zipWithIndex.toMap
  val severityByName: Map[String, Int] =
    severities.zipWithIndex.toMap ++
      // legacy aliases accepted by the reference's parser
      Map("error" -> 3, "warn" -> 4, "panic" -> 0, "emergency" -> 0)

  /** facility number from pri (pri >> 3). */
  def facilityNum(pri: Column): Column = (pri / 8).cast("int")

  /** severity number from pri (pri & 7). */
  def severityNum(pri: Column): Column = pmod(pri, lit(8)).cast("int")

  /** symbolic facility name; null when out of range. */
  def facilityName(pri: Column): Column =
    element_at(array(facilities.map(lit): _*), facilityNum(pri) + 1)

  /** symbolic severity name. */
  def severityName(pri: Column): Column =
    element_at(array(severities.map(lit): _*), severityNum(pri) + 1)

  def mkPri(facility: Column, severity: Column): Column =
    (facility * 8 + severity).cast("int")
}
