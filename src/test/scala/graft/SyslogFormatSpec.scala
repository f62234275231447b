package graft

import java.time.ZoneId

import graft.parsers.SyslogFormat
import graft.parsers.SyslogFormat.{Flags, Options}

/** RFC3164/RFC5424 classification ported from lib/tests/test_msgparse.c —
  * same fixture clock (Fri Feb 8 09:37:49 CET 2019 = 1549615069.123) and
  * zone (TZ=MET-1METDST ≈ CET with DST).
  */
class SyslogFormatSpec extends org.scalatest.funsuite.AnyFunSuite {

  private val cet = ZoneId.of("CET")
  private def opts(flags: String*) = Options(
    flags = flags.toSet, recvZone = cet, nowEpochUsec = 1549615069123000L)

  private case class Exp(
      pri: Int, sec: Long, usec: Int, ofs: Int,
      host: String, prog: String, msg: String,
      pid: String = "", msgid: String = "")

  private def check(line: String, o: Options, e: Exp): Unit = {
    val m = SyslogFormat.parse(line, o)
    assert(m.pri === e.pri, s"pri of: $line")
    if (e.sec > 1) assert(m.tsSec === e.sec, s"sec of: $line (got ${m.tsSec})")
    if (e.sec != 0) {
      assert(m.tsUsec === e.usec, s"usec of: $line")
      assert(m.tzOfs === e.ofs, s"tzofs of: $line")
    }
    assert(m.host === e.host, s"host of: $line")
    assert(m.prog === e.prog, s"prog of: $line")
    assert(m.msg === e.msg, s"msg of: $line")
    if (e.pid.nonEmpty) assert(m.pid === e.pid, s"pid of: $line")
    if (e.msgid.nonEmpty) assert(m.msgid === e.msgid, s"msgid of: $line")
  }

  test("test_timestamp: BSD, ISO, DST boundaries, nil 5424 stamp") {
    check("<15> openvpn[2499]: PTHREAD support initialized", opts(Flags.ExpectHostname),
      Exp(15, 0, 0, 0, "", "openvpn", "PTHREAD support initialized", pid = "2499"))
    check("<15>Jan  1 01:00:00 bzorp openvpn[2499]: PTHREAD support initialized", opts(Flags.ExpectHostname),
      Exp(15, 1546300800L, 0, 3600, "bzorp", "openvpn", "PTHREAD support initialized", pid = "2499"))
    check("<15>Jan 10 01:00:00 bzorp openvpn[2499]: PTHREAD support initialized", opts(Flags.ExpectHostname),
      Exp(15, 1547078400L, 0, 3600, "bzorp", "openvpn", "PTHREAD support initialized", pid = "2499"))
    check("<13>Jan  1 14:40:51 alma korte: message", opts(),
      Exp(13, 1546350051L, 0, 3600, "", "alma", "korte: message"))
    check("<7>2006-11-10T10:43:21.156+02:00 bzorp openvpn[2499]: PTHREAD support initialized", opts(Flags.ExpectHostname),
      Exp(7, 1163148201L, 156000, 7200, "bzorp", "openvpn", "PTHREAD support initialized", pid = "2499"))
    check("<7>2006-11-10T10:43:21.156+01:00 bzorp openvpn[2499]: PTHREAD support initialized", opts(Flags.ExpectHostname),
      Exp(7, 1163151801L, 156000, 3600, "bzorp", "openvpn", "PTHREAD support initialized", pid = "2499"))
    // absurdly long fraction truncates to usec
    check("<7>2006-11-10T10:43:21.15600000000000000000000000000000000000000000000000000000000000+01:00 bzorp openvpn[2499]: x",
      opts(Flags.ExpectHostname),
      Exp(7, 1163151801L, 156000, 3600, "bzorp", "openvpn", "x", pid = "2499"))
    check("<7>2006-11-10T10:43:21.15600000000 bzorp openvpn[2499]: x", opts(Flags.ExpectHostname),
      Exp(7, 1163151801L, 156000, 3600, "bzorp", "openvpn", "x", pid = "2499"))
    // DST boundary with explicit zones
    check("<7>2006-03-26T01:59:59.156+01:00 bzorp openvpn[2499]: x", opts(Flags.ExpectHostname),
      Exp(7, 1143334799L, 156000, 3600, "bzorp", "openvpn", "x", pid = "2499"))
    check("<7>2006-03-26T02:00:00.156+01:00 bzorp openvpn[2499]: x", opts(Flags.ExpectHostname),
      Exp(7, 1143334800L, 156000, 3600, "bzorp", "openvpn", "x", pid = "2499"))
    check("<7>2006-03-26T03:00:00.156+02:00 bzorp openvpn[2499]: x", opts(Flags.ExpectHostname),
      Exp(7, 1143334800L, 156000, 7200, "bzorp", "openvpn", "x", pid = "2499"))
    check("<7>2006-10-29T01:59:59.156+02:00 bzorp openvpn[2499]: x", opts(Flags.ExpectHostname),
      Exp(7, 1162079999L, 156000, 7200, "bzorp", "openvpn", "x", pid = "2499"))
    // RFC5424 nil timestamp → receive time
    check("<7>1 - bzorp openvpn 2499 - - PTHREAD support initialized", opts(Flags.SyslogProtocol),
      Exp(7, 1549615069L, 123000, 3600, "bzorp", "openvpn", "PTHREAD support initialized", pid = "2499"))
  }

  test("test_hostname: check-hostname charset gate") {
    check("<7>2006-10-29T02:00:00.156+01:00 %bzorp openvpn[2499]: PTHREAD support initialized",
      opts(Flags.CheckHostname, Flags.ExpectHostname),
      Exp(7, 1162083600L, 156000, 3600, "", "%bzorp", "openvpn[2499]: PTHREAD support initialized"))
    check("<7>2006-10-29T02:00:00.156+01:00 bzorp openvpn[2499]: PTHREAD support initialized",
      opts(Flags.CheckHostname, Flags.ExpectHostname),
      Exp(7, 1162083600L, 156000, 3600, "bzorp", "openvpn", "PTHREAD support initialized", pid = "2499"))
  }

  test("test_timestamp_others: no-hostname mode, bare stamps, bad-hostname regex, PIX, Dell") {
    check("<7>2006-10-29T02:00:00.156+01:00 bzorp openvpn[2499]: PTHREAD support initialized", opts(),
      Exp(7, 1162083600L, 156000, 3600, "", "bzorp", "openvpn[2499]: PTHREAD support initialized"))
    check("<7>2006-10-29T02:00:00.156+01:00 ", opts(Flags.ExpectHostname),
      Exp(7, 1162083600L, 156000, 3600, "", "", ""))
    check("<7>2006-10-29T02:00:00.156+01:00", opts(Flags.ExpectHostname),
      Exp(7, 1162083600L, 156000, 3600, "", "", ""))
    // missing 'T'
    check("<7>2006-10-29 02:00:00.156+01:00", opts(Flags.ExpectHostname),
      Exp(7, 1162083600L, 156000, 3600, "", "", ""))
    // bad-hostname regex rejects the candidate → it becomes the program
    check("<7>2006-10-29T02:00:00.156+01:00 ctld snmpd[2499]: PTHREAD support initialized",
      opts(Flags.ExpectHostname).copy(badHostname = Some("^ctld")),
      Exp(7, 1162083600L, 156000, 3600, "", "ctld", "snmpd[2499]: PTHREAD support initialized"))
    check("<7> Aug 29 02:00:00.156 ctld snmpd[2499]: PTHREAD support initialized",
      opts(Flags.ExpectHostname).copy(badHostname = Some("^ctld")),
      Exp(7, 1, 156000, 7200, "", "ctld", "snmpd[2499]: PTHREAD support initialized"))
    check("<7> Aug 29 02:00:00.156789 ctld snmpd[2499]: x",
      opts(Flags.ExpectHostname).copy(badHostname = Some("^ctld")),
      Exp(7, 1, 156789, 7200, "", "ctld", "snmpd[2499]: x"))
    check("<7> Aug 29 02:00:00. ctld snmpd[2499]: x",
      opts(Flags.ExpectHostname).copy(badHostname = Some("^ctld")),
      Exp(7, 1, 0, 7200, "", "ctld", "snmpd[2499]: x"))
    check("<7>Aug 29 02:00:00 bzorp ctld/snmpd[2499]: PTHREAD support initialized", opts(Flags.ExpectHostname),
      Exp(7, 1, 0, 7200, "bzorp", "ctld/snmpd", "PTHREAD support initialized", pid = "2499"))
    // Cisco PIX: MMM DD YYYY HH:MM:SS: %PROG:
    check("<190>Apr 15 2007 21:28:13: %PIX-6-302014: Teardown TCP connection 1688438 for bloomberg-net:1.2.3.4/8294 to inside:5.6.7.8/3639 duration 0:07:01 bytes 16975 TCP FINs",
      opts(Flags.ExpectHostname).copy(badHostname = Some("^%")),
      Exp(190, 1176665293L, 0, 7200, "", "%PIX-6-302014",
        "Teardown TCP connection 1688438 for bloomberg-net:1.2.3.4/8294 to inside:5.6.7.8/3639 duration 0:07:01 bytes 16975 TCP FINs"))
    // Dell switch: uppercase month, dashed-IP hostname
    check("<190>NOV 22 00:00:33 192.168.33.8-1 CMDLOGGER[165319912]: cmd_logger_api.c(83) 13518 %% CLI:192.168.32.100:root:User  logged in",
      opts(Flags.ExpectHostname),
      Exp(190, 1574377233L, 0, 3600, "192.168.33.8-1", "CMDLOGGER",
        "cmd_logger_api.c(83) 13518 %% CLI:192.168.32.100:root:User  logged in",
        pid = "165319912"))
  }

  test("RFC5424: SDATA multi-element, >32-char SD-ID, escapes, BOM") {
    val m = SyslogFormat.parse(
      "<5>1 2006-10-29T01:59:59.156+01:00 mymachine evntslog - - " +
        "[timeQuality isSynced=\"0\"][1234567890123456789012345678901234 i=\"long_33\"] " +
        "An application event log entry...",
      opts(Flags.SyslogProtocol))
    assert(m.pri === 5 && m.host === "mymachine" && m.prog === "evntslog")
    assert(m.tsSec === 1162083599L && m.tsUsec === 156000 && m.tzOfs === 3600)
    assert(m.msg === "An application event log entry...")
    assert(m.sdata.toMap === Map(
      ".SDATA.timeQuality.isSynced" -> "0",
      ".SDATA.1234567890123456789012345678901234.i" -> "long_33"))
    // escapes: \" \] \\ unescape, any other backslash stays
    val esc = SyslogFormat.parse(
      """<5>1 - h app - - [x a="q\"u\]o\\t\ne"] m""", opts(Flags.SyslogProtocol))
    assert(esc.sdata.toMap === Map(".SDATA.x.a" -> "q\"u]o\\t\\ne"))
    // BOM before the message strips
    val bom = SyslogFormat.parse(
      "<5>1 - h app - - - ﻿hello", opts(Flags.SyslogProtocol))
    assert(bom.msg === "hello")
  }

  test("test_bad_sd_data_unescaped: error form with >@< marker") {
    val m = SyslogFormat.parse(
      "<132>1 2006-10-29T01:59:59.156+01:00 mymachine evntslog - - [a i=\"\"ok\"] An application event log entry...",
      opts(Flags.SyslogProtocol))
    assert(m.pri === 43)
    assert(m.host === "")
    assert(m.prog === "syslog-ng")
    assert(m.msg === "Error processing log message: <132>1 2006-10-29T01:59:59.156+01:00 mymachine evntslog - - [a i=\">@<\"ok\"] An application event log entry...")
  }

  test("malformed digit slots scan as no-timestamp, never crash (review fix)") {
    // punctuation shape of ISO but letters in the digit slots
    val m1 = SyslogFormat.parse("<13>abcd-ef-gh ij:kl:mn rest of msg", opts())
    assert(m1.tags("syslog.missing_timestamp") && m1.pri === 13)
    // BSD punctuation shape with letter time fields
    val m2 = SyslogFormat.parse("<13>Jan 12 ab:cd:ef host prog: m", opts())
    assert(m2.tags("syslog.missing_timestamp"))
    // out-of-range date: Feb 30
    val m3 = SyslogFormat.parse("<13>Feb 30 10:00:00 host prog: m", opts())
    assert(m3.tags("syslog.missing_timestamp"))
    // cisco: Feb 30 / month 13 fail the timestamp branch (the SCL's
    // drop-invalid gate) instead of crashing the task
    assert(graft.parsers.CiscoParser.parse(
      "<189>1: h: Feb 30 11:22:33: %SYS-5-X: m", opts()).isEmpty)
    assert(graft.parsers.CiscoParser.parse(
      "<189>2019-13-01T00:00:00 h : %SYS-5-X: m", opts()).isEmpty)
  }

  test("pri/framing/repeat/AIX details") {
    // missing PRI tags and defaults to user.notice
    val noPri = SyslogFormat.parse("Jan  1 14:40:51 alma korte: message", opts())
    assert(noPri.pri === 13 && noPri.tags("syslog.missing_pri"))
    // RFC6587 frame-length residue tagged and skipped
    val framed = SyslogFormat.parse("25 <13>Jan  1 14:40:51 x y: z", opts())
    assert(framed.tags("syslog.unexpected_framing") && framed.pri === 13)
    // "last message repeated" keeps no host/program
    val rep = SyslogFormat.parse("<13>Jan  1 14:40:51 last message repeated 2 times", opts(Flags.ExpectHostname))
    assert(rep.host === "" && rep.prog === "" && rep.msg === "last message repeated 2 times")
    // AIX forwarded-message prefix recovers the origin host
    val aix = SyslogFormat.parse(
      "<13>Jan  1 14:40:51 Message forwarded from bzorp: prg[1]: hi", opts(Flags.ExpectHostname))
    assert(aix.host === "bzorp" && aix.prog === "prg" && aix.msg === "hi")
    // Cisco sequence id + sync marker
    val cisco = SyslogFormat.parse(
      "<189>65536: *Jan  1 14:40:51: %SYS-5-CONFIG_I: Configured", opts())
    assert(cisco.ciscoSeqId === "65536" && cisco.isSynced === "0")
    assert(cisco.prog === "%SYS-5-CONFIG_I" && cisco.msg === "Configured")
    // kernel facility + local flag ⇒ program "kernel"
    val kern = SyslogFormat.parse("<6>some kernel text", opts(Flags.Local))
    assert(kern.prog === "kernel" && kern.msg === "some kernel text")
  }
}
