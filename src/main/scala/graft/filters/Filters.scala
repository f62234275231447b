package graft.filters

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.model.SyslogNames

/** The reference's filter algebra (reference lib/filter/) re-expressed as
  * `Column` predicate builders. Boolean composition (`and/or/not`, reference
  * lib/filter/filter-op.c) is native `&& || !` on Column — Catalyst gets
  * short-circuiting, simplification and pushdown for free.
  *
  * Non-match is a routing signal, not row deletion (reference
  * lib/filter/filter-pipe.c:82-86) — these predicates feed the Router's
  * flag computation; only `drop-unmatched` paths turn them into `.filter`.
  */
object Filters {

  // --- pri-family filters (reference lib/filter/filter-pri.c) -------------

  /** facility(f1, f2, ...) — facility-name bitmask over pri >> 3. */
  def facility(pri: Column, names: String*): Column =
    SyslogNames.facilityNum(pri).isin(names.map(SyslogNames.facilityByName): _*)

  /** severity range `low..high` inclusive by name, e.g. emerg..warning. */
  def severityRange(pri: Column, worst: String, least: String): Column = {
    val lo = SyslogNames.severityByName(worst)
    val hi = SyslogNames.severityByName(least)
    SyslogNames.severityNum(pri).between(lo, hi)
  }

  def severityIn(pri: Column, names: String*): Column =
    SyslogNames.severityNum(pri).isin(names.map(SyslogNames.severityByName): _*)

  // --- string/regex matchers (reference lib/filter/filter-re.c,
  //     lib/logmatcher.c backends: pcre / string / glob) -------------------

  def matchRe(value: Column, re: String): Column = value.rlike(re)

  def matchReIgnoreCase(value: Column, re: String): Column =
    value.rlike("(?i)" + re)

  def matchLiteral(value: Column, s: String, ignoreCase: Boolean = false): Column =
    if (ignoreCase) lower(value) === s.toLowerCase else value === s

  def matchPrefix(value: Column, p: String): Column = value.startsWith(p)

  def matchSubstring(value: Column, s: String): Column = value.contains(s)

  /** glob backend: `*` and `?` wildcards (reference logmatcher.c:216-251). */
  def matchGlob(value: Column, glob: String): Column = {
    val escaped = glob.flatMap {
      case '*' => "%"
      case '?' => "_"
      case c @ ('%' | '_' | '\\') => "\\" + c
      case c => c.toString
    }
    value.like(escaped)
  }

  /** One matcher predicate from `type()` + `flags()` (reference
    * lib/logmatcher.c log_matcher_new + lib/filter/filter-re.c): `pcre`
    * is an unanchored find, `string` compares the whole value unless
    * `prefix`/`substring` flags narrow it, `glob` full-matches with `*`/`?`.
    * `ignore-case` folds case on the pcre/string backends (the reference's
    * glob backend has no case option either).
    */
  def matcher(pattern: String, tpe: String = "pcre",
      flags: Set[String] = Set.empty): Column => Column = {
    val ic = flags("ignore-case")
    tpe match {
      case "string" =>
        if (flags("prefix"))
          v => (if (ic) lower(v) else v).startsWith(if (ic) pattern.toLowerCase else pattern)
        else if (flags("substring"))
          v => (if (ic) lower(v) else v).contains(if (ic) pattern.toLowerCase else pattern)
        else v => matchLiteral(v, pattern, ic)
      case "glob" => v => matchGlob(v, pattern)
      case "pcre" | "" => v => if (ic) matchReIgnoreCase(v, pattern) else matchRe(v, pattern)
      case other => sys.error(s"unknown matcher type: $other")
    }
  }

  // --- in-list() (reference lib/filter/filter-in-list.c) ------------------

  /** field ∈ fixed set; Catalyst turns large sets into a hash-set lookup
    * (InSet) — the broadcast-semi-join alternative is only needed when the
    * list itself is a table.
    */
  def inList(value: Column, values: Seq[String]): Column =
    value.isin(values: _*)

  // --- tags() (reference lib/filter/filter-tags.c) ------------------------

  /** true if any of the listed tags is set on the row. */
  def hasAnyTag(tags: Column, names: String*): Column =
    arrays_overlap(tags, array(names.map(lit): _*))

  // --- comparisons (reference lib/filter/filter-cmp.c) --------------------

  /** Type-aware comparison: when both sides parse as numbers compare
    * numerically, else lexicographically (reference filter-cmp.c:118-235
    * GenericNumber coercion). `op` ∈ < <= == != >= >.
    */
  def cmpTypeAware(l: Column, r: Column, op: String): Column = {
    val ln = l.try_cast("double")
    val rn = r.try_cast("double")
    val numeric = ln.isNotNull && rn.isNotNull
    def both(f: (Column, Column) => Column): Column =
      when(numeric, f(ln, rn)).otherwise(f(l.cast("string"), r.cast("string")))
    op match {
      case "<"  => both(_ < _)
      case "<=" => both(_ <= _)
      case "==" => both(_ === _)
      case "!=" => both(_ =!= _)
      case ">=" => both(_ >= _)
      case ">"  => both(_ > _)
    }
  }

  /** String-forced comparison (the reference's `lt/le/eq/ne/ge/gt`). */
  def cmpString(l: Column, r: Column, op: String): Column = op match {
    case "lt" => l.cast("string") < r.cast("string")
    case "le" => l.cast("string") <= r.cast("string")
    case "eq" => l.cast("string") === r.cast("string")
    case "ne" => l.cast("string") =!= r.cast("string")
    case "ge" => l.cast("string") >= r.cast("string")
    case "gt" => l.cast("string") > r.cast("string")
  }

  /** `===` / `!==`: type AND value equality (reference filter-cmp.c:274). */
  def cmpTypedEq(l: Column, r: Column): Column = l <=> r

  // --- netmask() (reference lib/filter/filter-netmask.c) ------------------

  def ipv4ToLong(ip: Column): Column = {
    val p = split(ip, "\\.")
    element_at(p, 1).cast("long") * 16777216L +
      element_at(p, 2).cast("long") * 65536L +
      element_at(p, 3).cast("long") * 256L +
      element_at(p, 4).cast("long")
  }

  /** saddr within CIDR, e.g. netmask(col, "10.10.0.0/16"). */
  def netmask(ip: Column, cidr: String): Column = {
    val Array(base, bitsS) = cidr.split("/")
    val bits = bitsS.toInt
    val baseLong = base.split("\\.").map(_.toLong)
      .foldLeft(0L)((a, b) => a * 256 + b)
    val mask = if (bits == 0) 0L else (0xFFFFFFFFL << (32 - bits)) & 0xFFFFFFFFL
    ipv4ToLong(ip).bitwiseAND(lit(mask)) === lit(baseLong & mask)
  }

  // --- netmask6() (reference lib/filter/filter-netmask6.c:40) -------------

  /** Canonical 32-nibble hex form of a textual IPv6 address: `::` expands
    * to the missing zero groups, each group left-pads to 4 nibbles. Pure
    * array expressions — runs in the scan stage. (Dotted-IPv4-embedded
    * forms are not supported; the hex forms the reference's own radix
    * parser accepts are.)
    */
  def ipv6ToHex(ip: Column): Column = {
    val sides = split(ip, "::", 2)
    val nonEmpty = (a: Column) => filter(a, x => x =!= "")
    val left = nonEmpty(split(element_at(sides, 1), ":"))
    val right = when(size(sides) > 1, nonEmpty(split(try_element_at(sides, lit(2)), ":")))
      .otherwise(array().cast("array<string>"))
    val missing = lit(8) - size(left) - size(right)
    val zeros = when(missing > 0,
      transform(sequence(lit(1), missing), _ => lit("0")))
      .otherwise(array().cast("array<string>"))
    val groups = concat(left, zeros, right)
    lower(concat_ws("", transform(groups, g => lpad(g, 4, "0"))))
  }

  /** IPv6 CIDR membership, e.g. netmask6(col, "2001:db8::/32"): the CIDR
    * compiles at plan time (driver) to a nibble-prefix compare plus one
    * masked-nibble check when the prefix length is not nibble-aligned.
    */
  def netmask6(ip: Column, cidr: String): Column = {
    val Array(base, bitsS) = cidr.split("/")
    val bits = bitsS.toInt
    require(bits >= 0 && bits <= 128, s"bad prefix length in $cidr")
    val baseBytes = java.net.InetAddress.getByName(base).getAddress
    require(baseBytes.length == 16, s"$base is not an IPv6 address")
    val baseHex = baseBytes.map("%02x".format(_)).mkString
    val fullNibbles = bits / 4
    val remBits = bits % 4
    val hexCol = ipv6ToHex(ip)
    val prefixOk =
      if (fullNibbles == 0) lit(true)
      else substring(hexCol, 1, fullNibbles) === baseHex.substring(0, fullNibbles)
    if (remBits == 0) prefixOk
    else {
      val mask = (0xF << (4 - remBits)) & 0xF
      val baseNibble = Integer.parseInt(baseHex.substring(fullNibbles, fullNibbles + 1), 16) & mask
      val rowNibble = conv(substring(hexCol, fullNibbles + 1, 1), 16, 10).cast("int")
      prefixOk && rowNibble.bitwiseAND(lit(mask)) === lit(baseNibble)
    }
  }

  /** File-backed in-list() (reference lib/filter/filter-in-list.c:42 reads
    * one value per line at config time): the file is read once on the
    * driver when the plan is built; Catalyst compiles the set into an
    * InSet hash lookup. For list files too big for a literal set, load
    * them as a table and broadcast-semi-join instead.
    */
  def inListFile(value: Column, path: String): Column = {
    val values = scala.jdk.CollectionConverters.ListHasAsScala(
      java.nio.file.Files.readAllLines(java.nio.file.Paths.get(path))).asScala
      .map(_.trim).filter(_.nonEmpty).toSeq
    inList(value, values)
  }
}
