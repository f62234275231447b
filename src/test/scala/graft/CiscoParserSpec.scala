package graft

import java.time.ZoneId

import graft.parsers.{CiscoParser, SyslogFormat}

/** cisco-parser() classification — the light suite's table
  * (tests/light/functional_tests/parsers/cisco-parser/test_cisco_parser.py)
  * over the native classifier.
  */
class CiscoParserSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  private val opt = SyslogFormat.Options(
    recvZone = ZoneId.of("CET"), nowEpochUsec = 1549615069123000L)

  private def p(line: String) = CiscoParser.parse(line, opt).get

  private def dateOf(m: CiscoParser.CMsg): String = {
    val ofs = opt.recvZone.getRules
      .getOffset(java.time.Instant.ofEpochSecond(m.tsSec)).getTotalSeconds
    java.time.LocalDateTime.ofEpochSecond(m.tsSec + ofs, 0, java.time.ZoneOffset.UTC)
      .format(java.time.format.DateTimeFormatter.ofPattern("MMM dd HH:mm:ss"))
  }

  test("light-suite cisco cases: IOS seq+origin+marker, triplets, NGFW, XR/CBR8 cpu modules") {
    val m1 = p("<189>29: foo: *Apr 29 13:58:40.411: %SYS-5-CONFIG_I: Configured from console by console")
    assert(m1.pri === 189 && m1.host === "foo" && m1.seqId === "29")
    assert(dateOf(m1) === "Apr 29 13:58:40" && m1.tsUsec === 411000)
    assert(m1.facility === "SYS" && m1.severity === "5" && m1.mnemonic === "CONFIG_I")
    assert(m1.msg === "%SYS-5-CONFIG_I: Configured from console by console")
    assert(m1.isSynced === "0") // '*' marks an unsynced clock

    val m2 = p("<190>30: foo: *Apr 29 13:58:46.411: %SYS-6-LOGGINGHOST_STARTSTOP: Logging to host 192.168.1.239 stopped - CLI initiated")
    assert(m2.pri === 190 && m2.mnemonic === "LOGGINGHOST_STARTSTOP" && m2.severity === "6")

    // no origin: timestamp directly after the sequence id
    val m4 = p("<189>35: *Apr 29 14:00:16.059: %SYS-5-CONFIG_I: Configured from console by console")
    assert(m4.host === "" && dateOf(m4) === "Apr 29 14:00:16" && m4.tsUsec === 59000)

    // embedded dash in the facility
    val m5 = p("<190>32: foo: *Apr 29 13:58:46.411: %SYSMGR-STANDBY-3-SHUTDOWN_START: The System Manager has started the shutdown procedure.")
    assert(m5.facility === "SYSMGR-STANDBY" && m5.severity === "3" && m5.mnemonic === "SHUTDOWN_START")

    // '.' marker = synced clock; trailing timezone word ignored
    val m6 = p("<180>782431: machine1: .Nov 18 21:03:22.631 GMT: %CDP-4-NATIVE_VLAN_MISMATCH: Native VLAN mismatch discovered on TenGigabitEthernet.")
    assert(m6.host === "machine1" && m6.isSynced === "1")
    assert(dateOf(m6) === "Nov 18 21:03:22" && m6.tsUsec === 631000)
    assert(m6.facility === "CDP")

    // NGFW: ISO timestamp, origin host at end, numeric mnemonic
    val m7 = p("<166>2022-02-16T15:31:53Z na-zy-int-fp1140-p02 : %FTD-6-305012: Teardown dynamic TCP translation from FOO-WAN_IN:10.44.60.80/59877 to FOO-OUTSIDE:6.7.8.9/59877 duration 0:01:01")
    assert(m7.pri === 166 && m7.host === "na-zy-int-fp1140-p02")
    assert(dateOf(m7) === "Feb 16 15:31:53" && m7.tsUsec === 0)
    assert(m7.facility === "FTD" && m7.mnemonic === "305012")

    // ASA: BSD timestamp + origin host at end
    val m7b = p("<164>Aug 08 16:58:18 DEVICE123 : %FTD-4-106023: test cisco asa")
    assert(m7b.host === "DEVICE123" && dateOf(m7b) === "Aug 08 16:58:18")

    // origin host, no timestamp → receive time
    val m8 = p("<190>123030: some-remote-host: %SYS-5-LOGGINGHOST_STARTSTOP: Logging to host 192.168.1.239 stopped - CLI initiated")
    assert(m8.host === "some-remote-host" && m8.tsSec === 1549615069L)

    // IOS-XR: RP cpu module; header program[pid] after the ts is discarded
    val m9 = p("<187>138076: RP/0/RP0/CPU0:Dec 11 12:43:29.227 EST: snmpd[1002]: %SNMP-SNMP-3-AUTH_FAIL : Received snmp request on unknown community from 0.0.0.0")
    assert(m9.cpuModule === "RP/0/RP0/CPU0" && m9.facility === "SNMP-SNMP")
    assert(m9.severity === "3" && m9.mnemonic === "AUTH_FAIL")
    assert(dateOf(m9) === "Dec 11 12:43:29" && m9.tsUsec === 227000)
    assert(m9.msg === "%SNMP-SNMP-3-AUTH_FAIL : Received snmp request on unknown community from 0.0.0.0")

    // CBR8: CLC line card module
    val m10 = p("<187>3408: CLC 6/0: Dec 11 13:31:14.214 EST: %PKI-3-CERTIFICATE_INVALID_EXPIRED: Certificate chain validation has failed.  The certificate (SN: XXXXXXXX) has expired.    Validity period ended on 2025-01-23T00:00:00Z")
    assert(m10.cpuModule === "CLC 6/0" && m10.facility === "PKI")
    assert(m10.mnemonic === "CERTIFICATE_INVALID_EXPIRED")

    // no ": %" split → invalid (the SCL's drop-invalid gate)
    assert(CiscoParser.parse("<189>29: plain message", opt).isEmpty)
  }

  test("stage: cisco columns + invalid flag; config driver routes on it") {
    val df = Seq(
      "<189>29: foo: *Apr 29 13:58:40.411: %SYS-5-CONFIG_I: Configured",
      "not cisco at all").toDF("text")
    val out = CiscoParser.stage(df, "text", opt)
    val ok = out.where(!col("cisco_invalid"))
    assert(ok.count() === 1)
    val r = ok.select("cisco_facility", "cisco_severity", "cisco_mnemonic",
      "cisco_host", "cisco_seqid", "cisco_pri").head()
    assert(r.getString(0) === "SYS" && r.getString(1) === "5" && r.getString(2) === "CONFIG_I")
    assert(r.getString(3) === "foo" && r.getString(4) === "29" && r.getInt(5) === 189)
    assert(out.where(col("cisco_invalid")).count() === 1)
  }
}
