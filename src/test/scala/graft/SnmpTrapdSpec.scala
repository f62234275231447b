package graft

import org.apache.spark.sql.functions._
import graft.parsers.SnmpTrapd

/** Ported cases from reference modules/afsnmp/tests/test_snmptrapd_parser.c
  * and test_varbindlist_scanner.c — every case in both files.
  */
class SnmpTrapdSpec extends SparkSpec {
  import spark.implicits._

  private def parsedMap(input: String, prefix: String = ".snmp."): Map[String, String] = {
    val p = SnmpTrapd.parse(input)
    assert(p != null, s"message unexpectedly dropped: $input")
    p.values.map { case (k, v) => SnmpTrapd.formatKey(prefix, k) -> v }.toMap
  }

  private def vb(input: String): Seq[(String, String, String)] =
    SnmpTrapd.scanVarBinds(input)

  // ---- test_snmptrapd_parser.c ----

  test("general v2 message with oids") {
    val m = parsedMap(
      "2017-05-10 12:46:14 web2-kukorica.syslog_ng.balabit [UDP: [127.0.0.1]:34257->[127.0.0.1]:162]:\n" +
        "iso.3.6.1.2.1.1.3.0 = Timeticks: (875496867) 101 days, 7:56:08.67\t" +
        "iso.3.6.1.6.3.1.1.4.1.0 = OID: iso.3.6.1.4.1.8072.2.3.0.1       " +
        "iso.3.6.1.4.1.8072.2.3.2.1 = INTEGER: 60        \t " +
        "iso.3.6.1.4.1.8072.2.1.3 = \"\"")
    assert(m(".snmp.hostname") === "web2-kukorica.syslog_ng.balabit")
    assert(m(".snmp.transport_info") === "UDP: [127.0.0.1]:34257->[127.0.0.1]:162")
    assert(m(".snmp.iso.3.6.1.2.1.1.3.0") === "(875496867) 101 days, 7:56:08.67")
    assert(m(".snmp.iso.3.6.1.6.3.1.1.4.1.0") === "iso.3.6.1.4.1.8072.2.3.0.1")
    assert(m(".snmp.iso.3.6.1.4.1.8072.2.3.2.1") === "60")
    assert(m(".snmp.iso.3.6.1.4.1.8072.2.1.3") === "")
    // DATE macro source: the header stamp
    val p = SnmpTrapd.parse(
      "2017-05-10 12:46:14 h [UDP: [1]:1->[2]:162]:\niso.1 = INTEGER: 1")
    assert(p.stampMicros ===
      java.time.LocalDateTime.of(2017, 5, 10, 12, 46, 14)
        .toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L)
  }

  test("general v1 message with oids") {
    val m = parsedMap(
      "2017-11-10 13:23:16 localhost [UDP: [127.0.0.1]:53831->[127.0.0.1]:162]: iso.3.6.1.4.1.8072.2.3.1\n" +
        "\t Enterprise Specific Trap (.17) Uptime: 18:41:07.83\n" +
        "iso.3.6.1.4.1.8072.2.1.1 = INTEGER: 123456")
    assert(m(".snmp.hostname") === "localhost")
    assert(m(".snmp.transport_info") === "UDP: [127.0.0.1]:53831->[127.0.0.1]:162")
    assert(m(".snmp.enterprise_oid") === "iso.3.6.1.4.1.8072.2.3.1")
    assert(m(".snmp.type") === "Enterprise Specific Trap")
    assert(m(".snmp.subtype") === ".17")
    assert(m(".snmp.uptime") === "18:41:07.83")
    assert(m(".snmp.iso.3.6.1.4.1.8072.2.1.1") === "123456")
  }

  test("v2 with symbolic names and various types") {
    val m = parsedMap(
      "2017-05-13 12:17:32 localhost [UDP: [127.0.0.1]:52407->[127.0.0.1]:162]:  \n " +
        "mib-2.1.3.0 = Timeticks: (875496867) 101 days, 7:56:08.67 \t" +
        "snmpModules.1.1.4.1.0 = OID: netSnmpExampleHeartbeatNotification " +
        "netSnmpExampleHeartbeatRate = INTEGER: 60\t" +
        "netSnmpExampleString = STRING: \"string innerkey='innervalue'\"\t" +
        "org.2.2 = Gauge32: 22\t" +
        "org.1.1 = Counter32: 11123123   " +
        "org.5.3 = Hex-STRING: A0 BB CC DD EF \t" +
        "org.8.8 = NULL\t" +
        "dod.7 = IpAddress: 192.168.1.0\t  " +
        "org.5.9 = STRING: \"@\"")
    assert(m(".snmp.hostname") === "localhost")
    assert(m(".snmp.snmpModules.1.1.4.1.0") === "netSnmpExampleHeartbeatNotification")
    assert(m(".snmp.netSnmpExampleHeartbeatRate") === "60")
    assert(m(".snmp.netSnmpExampleString") === "string innerkey='innervalue'")
    assert(m(".snmp.org.2.2") === "22")
    assert(m(".snmp.org.1.1") === "11123123")
    assert(m(".snmp.org.5.3") === "A0 BB CC DD EF")
    assert(m(".snmp.org.8.8") === "NULL")
    assert(m(".snmp.dod.7") === "192.168.1.0")
    assert(m(".snmp.org.5.9") === "@")
  }

  test("v1 with symbolic names") {
    val m = parsedMap(
      "2017-05-13 12:18:30  localhost  [UDP: [127.0.0.1]:58143->[127.0.0.1]:162] : netSnmpExampleNotification \n" +
        "\t Warm Start Trap (1) Uptime:  27 days, 2:39:02.34\n " +
        "netSnmpExampleInteger = INTEGER: 123456 \t netSnmpExampleString = STRING: random string")
    assert(m(".snmp.hostname") === "localhost")
    assert(m(".snmp.transport_info") === "UDP: [127.0.0.1]:58143->[127.0.0.1]:162")
    assert(m(".snmp.enterprise_oid") === "netSnmpExampleNotification")
    assert(m(".snmp.type") === "Warm Start Trap")
    assert(m(".snmp.subtype") === "1")
    assert(m(".snmp.uptime") === "27 days, 2:39:02.34")
    assert(m(".snmp.netSnmpExampleInteger") === "123456")
    assert(m(".snmp.netSnmpExampleString") === "random string")
  }

  test("v2 generated message (set_message_macro)") {
    val p = SnmpTrapd.parse(
      "2017-05-17 13:26:04 localhost [UDP: [127.0.0.1]:34257->[127.0.0.1]:162]:\n" +
        "iso.3.6.1.4.1.18372.3.2.1.1.1.6 = STRING: \"test\"")
    assert(p.message ===
      "hostname='localhost', transport_info='UDP: [127.0.0.1]:34257->[127.0.0.1]:162', " +
        "iso.3.6.1.4.1.18372.3.2.1.1.1.6='test'")
  }

  test("v2 generated message escapes quotes") {
    val p = SnmpTrapd.parse(
      "2017-05-17 13:26:04 localhost [UDP: [127.0.0.1]:34257->[127.0.0.1]:162]:\n" +
        "iso.3.6.1.4.1.18372.3.2.1.1.1.6 = STRING: \"test 'escaped'\"")
    assert(p.values.toMap.apply("iso.3.6.1.4.1.18372.3.2.1.1.1.6") === "test 'escaped'")
    assert(p.message ===
      "hostname='localhost', transport_info='UDP: [127.0.0.1]:34257->[127.0.0.1]:162', " +
        "iso.3.6.1.4.1.18372.3.2.1.1.1.6='test \\'escaped\\''")
  }

  test("empty prefix") {
    val m = parsedMap(
      "2017-05-17 13:26:04 localhost [UDP: [127.0.0.1]:34257->[127.0.0.1]:162]:\n" +
        "iso.3.6.1.4.1.18372.3.2.1.1.1.6 = test", prefix = "")
    assert(m("hostname") === "localhost")
    assert(m("transport_info") === "UDP: [127.0.0.1]:34257->[127.0.0.1]:162")
    assert(m("iso.3.6.1.4.1.18372.3.2.1.1.1.6") === "test")
  }

  test("key normalization: colon runs collapse to one underscore") {
    val m = parsedMap(
      "2017-05-13 12:17:32 localhost [UDP: [127.0.0.1]:52407->[127.0.0.1]:162]:  \n " +
        "mib-2.1.3.0 = Timeticks: (875496867) 101 days, 7:56:08.67 \t" +
        "NET-SNMP-EXAMPLES-MIB:netSnmpExampleString = STRING: \"random fact\" \t" +
        "NET-SNMP-EXAMPLES-MIB::netSnmpColons = STRING: \"Colossus colons\" \t" +
        "NET-SNMP-EXAMPLES-MIB::::::::::::::::::::::::::Trail = STRING: \"Gary Indiana\" \t" +
        ":NET-SNMP-EXAMPLES::::::::::::::::::::::::::::::MIB: = INTEGER: 1234 \t")
    assert(m(".snmp.NET-SNMP-EXAMPLES-MIB_netSnmpExampleString") === "random fact")
    assert(m(".snmp.NET-SNMP-EXAMPLES-MIB_netSnmpColons") === "Colossus colons")
    assert(m(".snmp.NET-SNMP-EXAMPLES-MIB_Trail") === "Gary Indiana")
    assert(m(".snmp._NET-SNMP-EXAMPLES_MIB_") === "1234")
  }

  test("v1 without varbind list") {
    val m = parsedMap(
      "2017-05-10 13:23:16 localhost [UDP: [127.0.0.1]:53831->[127.0.0.1]:162]: iso.3.6.1.4.1.8072.2.3.1\n" +
        "\t Enterprise Specific Trap (.17) Uptime: 18:41:07.83")
    assert(m(".snmp.enterprise_oid") === "iso.3.6.1.4.1.8072.2.3.1")
    assert(m(".snmp.type") === "Enterprise Specific Trap")
    assert(m(".snmp.subtype") === ".17")
    assert(m(".snmp.uptime") === "18:41:07.83")
  }

  test("snmptrapd debug message is dropped") {
    assert(SnmpTrapd.parse(
      "2017-05-19 10:00:00 NET-SNMP version 5.7.3 Stopped.\nStopping snmptrapd") === null)
  }

  test("v2 whose varbind list starts with a tab is dropped (v1 misdetect)") {
    assert(SnmpTrapd.parse(
      "2017-05-19 13:37:00 localhost [UDP: [127.0.0.1]:36324->[127.0.0.1]:162]:\n" +
        "\tiso.3.6.1.2.1.1.3.0 = Timeticks: (875496867) 101 days, 7:56:08.67 \t" +
        "iso.3.6.1.6.3.1.1.4.1.0 = OID: iso.3.6.1.4.1.8072.2.3.0.1 \t" +
        "iso.3.6.1.4.1.8072.2.3.2.1 = INTEGER: 60") === null)
  }

  test("v2 message with garbage after a newline stops the varbind scan") {
    val p = SnmpTrapd.parse(
      "2017-05-10 12:46:14 localhost [UDP: [127.0.0.1]:34257->[127.0.0.1]:162]:\n" +
        "iso.3.6.1.2.1.1.3.0 = Timeticks: (875496867) 101 days, 7:56:08.67\t" +
        "iso.3.6.1.6.3.1.1.4.1.0 = OID: iso.3.6.1.4.1.8072.2.3.0.1\n" +
        "garbage = stop here")
    val m = p.values.toMap
    assert(m("iso.3.6.1.2.1.1.3.0") === "(875496867) 101 days, 7:56:08.67")
    assert(m("iso.3.6.1.6.3.1.1.4.1.0") === "iso.3.6.1.4.1.8072.2.3.0.1")
    assert(!m.contains("garbage"))
  }

  // ---- test_varbindlist_scanner.c ----

  test("varbind: spaces as separator") {
    assert(vb("iso.3.6.1.6.3.1.1.4.1.0 = OID: iso.3.6.1.4.1.18372.3.2.1.1.2.2       " +
      "iso.3.6.1.4.1.18372.3.2.1.1.1.6 = STRING: \"svc/w4joHeFNzpFNrC8u9umJhc/ssh_4eyes_user_subjects:3/ssh\"") ===
      Seq(("iso.3.6.1.6.3.1.1.4.1.0", "OID", "iso.3.6.1.4.1.18372.3.2.1.1.2.2"),
        ("iso.3.6.1.4.1.18372.3.2.1.1.1.6", "STRING", "svc/w4joHeFNzpFNrC8u9umJhc/ssh_4eyes_user_subjects:3/ssh")))
  }

  test("varbind: tabs and spaces as separator") {
    assert(vb("\t iso.3.6.1.6.3.1.1.4.1.0 = OID: iso.3.6.1.4.1.18372.3.2.1.1.2.2\t" +
      "iso.3.6.1.4.1.18372.3.2.1.1.1.6 = STRING: \"svc/w4joHeFNzpFNrC8u9umJhc/ssh_4eyes_user_subjects:3/ssh\"\t\t" +
      "iso.1.2 = INTEGER: 40 \t" +
      "iso.3.4 = INTEGER: 30\t " +
      "iso.5.6 = INTEGER: 20  \t\t " +
      "iso.7.8 = INTEGER: 10") ===
      Seq(("iso.3.6.1.6.3.1.1.4.1.0", "OID", "iso.3.6.1.4.1.18372.3.2.1.1.2.2"),
        ("iso.3.6.1.4.1.18372.3.2.1.1.1.6", "STRING", "svc/w4joHeFNzpFNrC8u9umJhc/ssh_4eyes_user_subjects:3/ssh"),
        ("iso.1.2", "INTEGER", "40"),
        ("iso.3.4", "INTEGER", "30"),
        ("iso.5.6", "INTEGER", "20"),
        ("iso.7.8", "INTEGER", "10")))
  }

  test("varbind: key representations") {
    assert(vb(".1.3.6.1.2.1.1.3.0 = STRING: \"\"\t" +
      "IP-MIB::ipForwarding.0 = INTEGER: 0\t" +
      "sysUpTime.0 = Timeticks: 1:15:09:27.63\t" +
      "SNMP-VIEW-BASED-ACM-MIB::vacmSecurityModel.0.3.119.101.115 = xxx") ===
      Seq((".1.3.6.1.2.1.1.3.0", "STRING", ""),
        ("IP-MIB::ipForwarding.0", "INTEGER", "0"),
        ("sysUpTime.0", "Timeticks", "1:15:09:27.63"),
        ("SNMP-VIEW-BASED-ACM-MIB::vacmSecurityModel.0.3.119.101.115", "", "xxx")))
  }

  test("varbind: all types") {
    assert(vb(".iso.org.dod.internet.mgmt.mib-2.system.sysUpTime.0 = Timeticks: (875496867) 101 days, 7:56:08.67\t" +
      "iso.3.6.1.6.3.1.1.4.1.0 = OID: iso.3.6.1.4.1.8072.2.3.0.1\t" +
      "iso.3.6.1.4.1.8072.2.3.2.1 = INTEGER: 60\t" +
      "SNMP-VIEW-BASED-ACM-MIB::vacmSecurityModel.0.3.119.101.115 = STRING: \"random string\"\t" +
      "iso.3.2.2 = Gauge32: 22\t" +
      "iso.3.1.1 = Counter32: 11123123 \t" +
      "iso.3.5.3 = Hex-STRING: A0 BB CC DD EF\t" +
      "iso.3.8.8 = NULL \t" +
      "iso.2.1.1 = Timeticks: (34234234) 3 days, 23:05:42.34\t" +
      "SNMP-VIEW-BASED-ACM-MIB::vacmSecurityModel.0.wes = IpAddress: 192.168.1.0") ===
      Seq((".iso.org.dod.internet.mgmt.mib-2.system.sysUpTime.0", "Timeticks", "(875496867) 101 days, 7:56:08.67"),
        ("iso.3.6.1.6.3.1.1.4.1.0", "OID", "iso.3.6.1.4.1.8072.2.3.0.1"),
        ("iso.3.6.1.4.1.8072.2.3.2.1", "INTEGER", "60"),
        ("SNMP-VIEW-BASED-ACM-MIB::vacmSecurityModel.0.3.119.101.115", "STRING", "random string"),
        ("iso.3.2.2", "Gauge32", "22"),
        ("iso.3.1.1", "Counter32", "11123123"),
        ("iso.3.5.3", "Hex-STRING", "A0 BB CC DD EF"),
        ("iso.3.8.8", "", "NULL"),
        ("iso.2.1.1", "Timeticks", "(34234234) 3 days, 23:05:42.34"),
        ("SNMP-VIEW-BASED-ACM-MIB::vacmSecurityModel.0.wes", "IpAddress", "192.168.1.0")))
  }

  test("varbind: separator inside quoted value") {
    assert(vb("iso.1.2.3 = STRING: \"quoted = string \t innerkey='innervalue'\" \t" +
      "iso.3.8.8 = NULL\t") ===
      Seq(("iso.1.2.3", "STRING", "quoted = string \t innerkey='innervalue'"),
        ("iso.3.8.8", "", "NULL")))
  }

  test("varbind: multiline quoted value") {
    assert(vb("iso.3.6.1.4.1.18372.3.2.1.1.1.6 = STRING: \"multi \n line\r\nvalue\" \t" +
      "iso.3.8.8 = NULL") ===
      Seq(("iso.3.6.1.4.1.18372.3.2.1.1.1.6", "STRING", "multi \n line\r\nvalue"),
        ("iso.3.8.8", "", "NULL")))
  }

  // ---- the Spark stage ----

  test("stage: parses, drops invalid rows, sets program/stamp/message") {
    val df = Seq(
      ("a", "2017-05-17 13:26:04 localhost [UDP: [127.0.0.1]:34257->[127.0.0.1]:162]:\n" +
        "iso.1 = STRING: \"test\""),
      ("b", "2017-05-19 10:00:00 NET-SNMP version 5.7.3 Stopped.\nStopping snmptrapd"),
      ("c", "2017-11-10 13:23:16 host9 [UDP: [10.0.0.1]:53831->[10.0.0.2]:162]: iso.9\n" +
        "\t Cold Start Trap (0) Uptime: 1:02:03.04\n" +
        "NET-SNMP-MIB::val = INTEGER: 7")
    ).toDF("id", "line")
    val out = SnmpTrapd.stage(df, "line")
    val rows = out.select("id", "snmp_fields", "snmp_program", "snmp_message")
      .as[(String, Map[String, String], String, String)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq === Seq("a", "c")) // b dropped
    assert(rows(0)._2(".snmp.iso.1") === "test")
    assert(rows(0)._3 === "snmptrapd")
    assert(rows(0)._4.endsWith("iso.1='test'"))
    assert(rows(1)._2(".snmp.NET-SNMP-MIB_val") === "7")
    assert(rows(1)._2(".snmp.type") === "Cold Start Trap")
    val stamps = out.select(col("snmp_stamp").cast("string")).as[String].collect().sorted
    assert(stamps === Array("2017-05-17 13:26:04", "2017-11-10 13:23:16"))
  }

  test("stage: setMessageMacro=false leaves message unset") {
    val df = Seq(("a",
      "2017-05-17 13:26:04 localhost [UDP: [127.0.0.1]:1->[127.0.0.1]:162]:\niso.1 = x")).toDF("id", "line")
    val out = SnmpTrapd.stage(df, "line", setMessageMacro = false)
    assert(out.select("snmp_message").as[String].head() === null)
  }
}
