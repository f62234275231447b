package graft

import org.apache.spark.sql.functions._

import graft.functions.Templates

/** Template compiler + function registry — the analog of the reference's
  * lib/template/tests/test_template.c / test_macro.c table-driven cases.
  */
class TemplatesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    ("conv-1", 3, "assistant", "hello world", "bash", 12, 34, "10.1.2.3", "a,b,c", "/var/log/app.log"))
    .toDF("conv_id", "turn_idx", "role", "text", "tool", "n1", "n2", "ip", "lst", "path")

  private val resolver: Templates.Resolver = name =>
    if (df.columns.contains(name)) Some(col(name)) else None

  private def eval(tmpl: String): String =
    df.select(Templates.compile(tmpl, resolver).as("v")).as[String].head()

  test("literals, refs, braces, defaults, $$ escape") {
    assert(eval("plain") === "plain")
    assert(eval("$role") === "assistant")
    assert(eval("${role}x") === "assistantx")
    assert(eval("a $conv_id:$turn_idx b") === "a conv-1:3 b")
    assert(eval("${missing:-dflt}") === "dflt")
    assert(eval("${missing:-$role}") === "assistant")
    assert(eval("${tool}") === "bash")
    assert(eval("cost: $$5") === "cost: $5")
    assert(eval("") === "")
  }

  test("string functions") {
    assert(eval("$(uppercase $role)") === "ASSISTANT")
    assert(eval("$(lowercase ABC)") === "abc")
    assert(eval("$(length $text)") === "11")
    assert(eval("$(substr $text 6 5)") === "world")
    assert(eval("$(substr $text 6)") === "world")
    assert(eval("$(strip '  x  ')") === "x")
    assert(eval("$(echo $role $tool)") === "assistant bash")
    assert(eval("$(padding $turn_idx 4 0)") === "0003")
    assert(eval("$(sanitize 'a b/c')") === "a b_c") // default invalid set is '/'
    assert(eval("$(replace-delimiter ' ' '-' $text)") === "hello-world")
    assert(eval("$(basename $path)") === "app.log")
    assert(eval("$(dirname $path)") === "/var/log")
    assert(eval("$(base64-encode hi)") === "aGk=")
  }

  test("numeric functions render int64-first") {
    assert(eval("$(+ $n1 $n2)") === "46")
    assert(eval("$(- $n2 $n1)") === "22")
    assert(eval("$(* 6 7)") === "42")
    assert(eval("$(/ $n2 $n1)") === "2")
    assert(eval("$(% $n2 $n1)") === "10")
    assert(eval("$(min $n1 $n2 5)") === "5")
    assert(eval("$(max $n1 $n2)") === "34")
    assert(eval("$(average 2 4)") === "3")
    assert(eval("$(round 3.7)") === "4")
    assert(eval("$(+ 1.5 1)") === "2.50000000000000000000") // double path: %.20f
    assert(eval("$(+ 1 $(* 2 3))") === "7") // nested call
  }

  test("condition arguments: filter-expression grammar in $(if) (test_basicfuncs.c test_cond_funcs)") {
    // resolver exposing the reference fixture's fields: pri 166 = local4.info?
    // no — local3.err: fac 19 (local3), sev 3; FACILITY/PID resolve as macros
    val d2 = Seq((19 * 8 + 3, "23323", "syslog-ng", "árvíztűrőtükörfúrógép msg"))
      .toDF("pri", "pid", "prog", "text")
    val fac = graft.model.SyslogNames.facilityName(col("pri"))
    val r: Templates.Resolver = {
      case "FACILITY" => Some(fac)
      case "FACILITY_NUM" => Some((col("pri") / 8).cast("int"))
      case "PID" => Some(col("pid"))
      case n if d2.columns.contains(n) => Some(col(n))
      case _ => None
    }
    def ev(t: String): String =
      d2.select(Templates.compile(t, r).as("v")).as[String].head()
    assert(ev("$(if 'facility(local4)' alma korte)") === "korte")
    assert(ev("$(if 'facility(local3)' alma korte)") === "alma")
    assert(ev("""$(if '"$FACILITY" lt "local3"' alma korte)""") === "korte")
    assert(ev("""$(if '"$FACILITY" le "local3"' alma korte)""") === "alma")
    assert(ev("""$(if '"$FACILITY" eq "local3"' alma korte)""") === "alma")
    assert(ev("""$(if '"$FACILITY" ne "local3"' alma korte)""") === "korte")
    assert(ev("""$(if '"$FACILITY" gt "local3"' alma korte)""") === "korte")
    assert(ev("""$(if '"$FACILITY" ge "local3"' alma korte)""") === "alma")
    assert(ev("""$(if '"$FACILITY_NUM" < "19"' alma korte)""") === "korte")
    assert(ev("""$(if '"$FACILITY_NUM" <= "19"' alma korte)""") === "alma")
    assert(ev("""$(if '"$FACILITY_NUM" == "19"' alma korte)""") === "alma")
    assert(ev("""$(if '"$FACILITY_NUM" != "19"' alma korte)""") === "korte")
    assert(ev("""$(if '"$FACILITY_NUM" > "19"' alma korte)""") === "korte")
    assert(ev("""$(if '"$FACILITY_NUM" >= "19"' alma korte)""") === "alma")
    assert(ev("""$(if '"$FACILITY_NUM" >= "19" and "kicsi" eq "nagy"' alma korte)""") === "korte")
    assert(ev("""$(if '"$FACILITY_NUM" >= "19" or "kicsi" eq "nagy"' alma korte)""") === "alma")
    assert(ev("""$(if program("slog-ng" type(pcre)) alma korte)""") === "alma")
    // numeric-first type-aware compare: "9" < "10" numerically
    assert(ev("""$(if '"9" < "10"' alma korte)""") === "alma")
    assert(ev("""$(if '"9" lt "10"' alma korte)""") === "korte") // string compare
    // value-truthiness fallback (curated surface, not a filter expression)
    assert(ev("$(if $pid yes no)") === "yes")
    // variadic $(or)
    assert(ev("""$(or 1 "" 2)""") === "1")
    assert(ev("""$(or "" 2)""") === "2")
    assert(ev("""$(or "" "")""") === "")
    assert(ev("$(or)") === "")
  }

  test("$(filter)/$(map) with filter-expression conditions over $_ (test_filter/test_map)") {
    val d2 = Seq(("árvíztűrőtükörfúrógép msg")).toDF("text")
    val r: Templates.Resolver = n => if (n == "text") Some(col(n)) else None
    def ev(t: String): String =
      d2.select(Templates.compile(t, r).as("v")).as[String].head()
    assert(ev("Some prefix $(filter ('1' == '1') 0,1,2)") === "Some prefix 0,1,2")
    assert(ev("$(filter ('$_' le '1') 0,1,2)") === "0,1")
    assert(ev("$(filter ('$(% $_ 2)' eq '0') 0,1,2,3)") === "0,2")
    assert(ev("Something $(filter ('$_' eq '0') '')") === "Something ")
    assert(ev("$(filter ('1' eq '0') '')") === "")
    assert(ev("$(filter message('árvíz') 'doesnotchange')") === "doesnotchange")
    assert(ev("$(filter (message('donotmatch') or ('1' eq '1')) 'x')") === "x")
    assert(ev("""Some prefix $(map "$(+ 1 $_)" 0,1,2)""") === "Some prefix 1,2,3")
    assert(ev("""Some prefix $(map "$(+ 1 $_)" $(+ 1 1))""") === "Some prefix 3")
    assert(ev("""Some prefix $(map "$(+ 1 $_)" '')""") === "Some prefix ")
    assert(ev("""Some prefix $(map $(+ 1 $_) $(map $(+ 1 $_) 0,1,2))""") === "Some prefix 2,3,4")
    assert(ev("""Some prefix $(map "$(if ('$_' eq '1') 'same' 'different')" 0,1,2)""")
      === "Some prefix different,same,different")
    assert(ev("""Some prefix $(map "$(if ('$_' le '1') 'smaller' 'larger')" 0,1,2)""")
      === "Some prefix smaller,smaller,larger")
    assert(ev("""$(map "$(if ('$(echo $_)' eq '1') 'same' 'different')" 0,1,2)""")
      === "different,same,different")
  }

  test("$(template): static + dynamic binding with fallback (tf-template.c, test_tf_template)") {
    val d2 = Seq(("bzorp", "dummy")).toDF("HOST", "template_name")
    val r: Templates.Resolver = n => if (d2.columns.contains(n)) Some(col(n)) else None
    val user = Map("dummy" -> "dummy template expanded $HOST")
    def ev(t: String): String =
      d2.select(Templates.compile(t, r, user).as("v")).as[String].head()
    assert(ev("foo $(template dummy) bar") === "foo dummy template expanded bzorp bar")
    assertThrows[IllegalArgumentException](ev("foo $(template unknown) bar"))
    assert(ev("foo $(template ${template_name}) bar") === "foo dummy template expanded bzorp bar")
    assert(ev("foo $(template '${unknown:-unknown}' fallback) bar") === "foo fallback bar")
    assert(ev("foo $(template '${unknown:-unknown}' fallback more args $HOST) bar")
      === "foo fallback more args bzorp bar")
    assert(ev("foo $(template '${unknown:-unknown}') bar") === "foo  bar")
  }

  test("numeric functions: reference test_numeric_funcs expectations (test_basicfuncs.c:264)") {
    assert(eval("$(+ -1 -1)") === "-2")
    assert(eval("$(/ 19 0)") === "NaN")
    assert(eval("$(% 19 0)") === "NaN")
    assert(eval("$(+ foo bar)") === "NaN")
    assert(eval("$(/ 2147483648 1)") === "2147483648")
    assert(eval("$(+ 5000000000 5000000000)") === "10000000000")
    assert(eval("$(% 10000000000 5000000001)") === "4999999999")
    assert(eval("$(* 5000000000 2)") === "10000000000")
    assert(eval("$(- 10000000000 5000000000)") === "5000000000")
    assert(eval("$(+ 1.5 .25)") === "1.75000000000000000000")
    assert(eval("$(- -1.5 .25)") === "-1.75000000000000000000")
    assert(eval("$(/ 3 2)") === "1")
    assert(eval("$(/ 3.0 2)") === "1.50000000000000000000")
    assert(eval("$(/ 3 2.0)") === "1.50000000000000000000")
    assert(eval("$(* 1.5 2.0)") === "3.00000000000000000000")
    assert(eval("$(% 3.14 0.7)") === "0.34000000000000030198")
    assert(eval("$(+ 5e-1 0)") === "0.50000000000000000000")
    assert(eval("$(% -7 2)") === "-1") // C %: sign of the dividend, not pmod
    assert(eval("$(round 2.0)") === "2")
    assert(eval("$(round 2.123456 3)") === "2.123")
    assert(eval("$(round 2.123456 4)") === "2.1235")
    assert(eval("$(round 0.5)") === "1")
    assert(eval("$(round 2 -1)") === "NaN")
    assert(eval("$(round 2 21)") === "NaN")
    assert(eval("$(round 2 0)") === "2")
    assert(eval("$(round 2 20)") === "2.00000000000000000000")
    assert(eval("$(floor 0.7)") === "0")
    assert(eval("$(ceil 0.2)") === "1")
    // aggregates skip int64-invalid values; all-invalid renders empty
    // (test_numeric_aggregate_invalid_values / _full_invalid_values)
    assert(eval("$(sum abc 1 c 2 '')") === "3")
    assert(eval("$(min abc 1 c 2 '')") === "1")
    assert(eval("$(max abc 1 c 2 '')") === "2")
    assert(eval("$(average abc 1 c 2 '')") === "1")
    assert(eval("$(sum abc 184467440737095516160 c '')") === "")
    assert(eval("$(average 1 -1 3)") === "1")
  }

  test("cond + list + crypto functions") {
    assert(eval("$(if $tool yes no)") === "yes")
    assert(eval("$(if '' yes no)") === "no")
    assert(eval("$(or '' $role)") === "assistant")
    assert(eval("$(list-head $lst)") === "a")
    assert(eval("$(list-nth 1 $lst)") === "b") // reference order: INDEX first
    assert(eval("$(list-tail $lst)") === "b,c")
    assert(eval("$(list-count $lst)") === "3")
    assert(eval("$(list-append $lst d)") === "a,b,c,d")
    assert(eval("$(list-slice 0:2 $lst)") === "a,b") // reference form: FROM:TO first
    assert(eval("$(implode - $lst)") === "a-b-c")
    assert(eval("$(explode / $path)") === "\"\",var,log,app.log") // empty element encodes as ""
    assert(eval("$(ipv4-to-int $ip)") === "167838211")
    assert(eval("$(sha256 x 8)") === "2d711642") // sha256("x") prefix
    assert(eval("$(md5 x 8)") === "9dd4e461")
    assert(eval("$(sha512 x 8)") === "a4abd444")
    // $(binary): static dec/hex/oct octets (str-funcs.c tf_binary)
    assert(eval("$(binary 0x41 66 0103)") === "ABC")
    // underscore plugin aliases
    assert(eval("$(format_json role=$role)") === """{"role":"assistant"}""")
  }

  test("reference template-engine edge cases (lib/template/tests/test_template.c)") {
    // $$ escapes compose with refs: "$$$1$$" -> "$" + $1 + "$"
    assert(eval("$$${role}$$") === "$assistant$")
    // unbalanced closers are literal; a lone $ before a non-name char too
    assert(eval("$unbalanced_brace}") === "}")
    assert(eval("$}") === "$}")
    assert(eval("$unbalanced_paren)") === ")")
    // unterminated opens are compile errors
    intercept[IllegalArgumentException](eval("${unbalanced_brace"))
    intercept[IllegalArgumentException](eval("$(echo $role"))
    // arg lexing: newlines separate, empty quoted args are kept, both quote
    // styles expand nested templates (test_template.c:387-392, 453-456)
    assert(eval("$(echo\n$role\n$turn_idx)") === "assistant 3")
    assert(eval("$(echo foo '' bar)") === "foo  bar")
    assert(eval("$(echo \"$(echo $role)\" $turn_idx)") === "assistant 3")
    assert(eval("$(echo \"$(echo '$(echo $role)')\" $turn_idx)") === "assistant 3")
    assert(eval("$(echo '\"$(echo $(echo $role))\"' $turn_idx)") === "\"assistant\" 3")
    assert(eval("dani $(echo $role $(echo huha)) balint") === "dani assistant huha balint")
  }

  test("user template functions: $(NAME) expands a named template (user-function.c)") {
    val user = Map("t_who" -> "$role@$conv_id", "t_wrap" -> "[$(t_who)]",
      "t_loop" -> "$(t_loop)")
    def evalU(t: String): String =
      df.select(Templates.compile(t, resolver, user).as("v")).as[String].head()
    assert(evalU("$(t_who)") === "assistant@conv-1")
    assert(evalU("x $(t_wrap) y") === "x [assistant@conv-1] y") // nested user call
    // builtins shadow user names; args and recursion are compile errors
    intercept[IllegalArgumentException](evalU("$(t_who arg)"))
    intercept[IllegalArgumentException](evalU("$(t_loop)"))
  }

  test("format functions") {
    assert(eval("$(format-json role=$role n=$turn_idx)") ===
      """{"role":"assistant","n":"3"}""")
    assert(eval("$(format-welf id=$conv_id msg=$text)") ===
      """id=conv-1 msg="hello world"""")
  }

  test("macro resolver: pri + date family over parsed rows") {
    val parsed = Seq(("2026-03-05 06:07:08", 165, "boot msg"))
      .toDF("tss", "pri", "text")
      .withColumn("ts", col("tss").cast("timestamp"))
      .withColumn("fields", map(lit("host"), lit("h1"), lit("prog"), lit("p1")))
      .withColumn("tags", array(lit("t1"), lit("t2")))
    val r = Templates.standardResolver(parsed.columns.toSet, col("ts"), col("pri"), col("fields"))
    def ev(t: String): String =
      parsed.select(Templates.compile(t, r).as("v")).as[String].head()
    assert(ev("$FACILITY.$SEVERITY") === "local4.notice") // 165 = 20*8+5
    assert(ev("$PRI") === "165")
    assert(ev("$YEAR-$MONTH-$DAY $HOUR:$MIN:$SEC") === "2026-03-05 06:07:08")
    assert(ev("$UNIXTIME") === "1772690828")
    assert(ev("$HOST/$PROGRAM: $MSG") === "h1/p1: boot msg")
    assert(ev("$TAGS") === "t1,t2")
    assert(ev("$(tag t1)/$(tag t9)") === "1/0")
    assert(ev("$(tags-head)") === "t1")
  }

  test("str/fname function reference cases (test_str_funcs / test_fname_funcs)") {
    assert(eval("$(length $role $tool)") === "9 4")
    assert(eval("$(length $role)") === "9")
    assert(eval("$(length)") === "")
    assert(eval("$(strip '  value  ')") === "value")
    assert(eval("$(strip '   ')") === "")
    assert(eval("$(strip '' ' value ' '')") === "value") // empties skipped
    assert(eval("$(strip ' v1 ' 'v2' ' v3 ')") === "v1 v2 v3")
    assert(eval("$(strip ŐRÜLT_ÍRÓ)") === "ŐRÜLT_ÍRÓ")
    assert(eval("$(sanitize alma/bela)") === "alma_bela")
    assert(eval("$(sanitize -r @ alma/bela)") === "alma@bela")
    assert(eval("$(sanitize -i @ alma@bela)") === "alma_bela")
    assert(eval("$(sanitize -i '@/l ' alma@/bela)") === "a_ma__be_a")
    assert(eval("$(sanitize $role $tool)") === "assistant/bash") // args join with '/'
    assert(eval("$(indent-multi-line 'foo\nbar')") === "foo\n\tbar")
    assert(eval("$(lowercase ŐRÜLT ÍRÓ)") === "őrült író")
    assert(eval("$(uppercase őrült író)") === "ŐRÜLT ÍRÓ")
    assert(eval("$(padding foo 10)") === "       foo")
    assert(eval("$(padding foo 10 x)") === "xxxxxxxfoo")
    assert(eval("$(padding foo 10 abc)") === "abcabcafoo")
    assert(eval("$(padding foo 2)") === "foo") // longer value than width
    assert(eval("$(padding foo 3)") === "foo")
    assert(eval("$(padding foo 6 abc)") === "abcfoo")
    assert(eval("$(padding foo 4 '')") === " foo") // empty pad string → space
    assert(eval("[$(base64-encode)]") === "[]")
    assert(eval("[$(base64-encode abc)]") === "[YWJj]")
    assert(eval("[$(base64-encode abcd)]") === "[YWJjZA==]")
    assert(eval("[$(base64-encode abcd abcd abcd abcd)]") === "[YWJjZGFiY2RhYmNkYWJjZA==]")
    assert(eval("[$(base64-encode 'X X')]") === "[WCBY]")
    assert(eval("$(basename foo)") === "foo")
    assert(eval("$(basename /foo/bar)") === "bar")
    assert(eval("$(basename /foo/bar/baz)") === "baz")
    assert(eval("$(dirname foo)") === ".")
    assert(eval("$(dirname /foo/bar)") === "/foo")
    assert(eval("$(dirname /foo/bar/)") === "/foo/bar")
    assert(eval("$(dirname /foo/bar/baz)") === "/foo/bar")
  }

  test("LIST value semantics: quoting, escapes, slices, search modes (test_list_funcs)") {
    assert(eval("$(list-concat)") === "")
    assert(eval("$(list-concat foo bar baz)") === "foo,bar,baz")
    assert(eval("$(list-concat foo bar baz '')") === "foo,bar,baz")
    assert(eval("$(list-concat foo $role,$tool bar)") === "foo,assistant,bash,bar")
    assert(eval("$(list-append)") === "")
    assert(eval("$(list-append '' foo)") === "foo")
    assert(eval("$(list-append '' foo bar baz)") === "foo,bar,baz")
    assert(eval("$(list-append foo,bar,baz 'x')") === "foo,bar,baz,x")
    assert(eval("$(list-append foo,bar,baz '')") === "foo,bar,baz,\"\"")
    assert(eval("$(list-append foo,bar,baz 'xxx,')") === "foo,bar,baz,\"xxx,\"")
    assert(eval("$(list-append foo,bar,baz 'a\tb')") === "foo,bar,baz,\"a\\tb\"")
    assert(eval("$(list-head '')") === "")
    assert(eval("$(list-head foo,)") === "foo")
    assert(eval("$(list-head ,bar,baz)") === "bar") // unquoted empty drops
    assert(eval("$(list-head foo bar baz)") === "foo")
    assert(eval("$(list-head '' bar baz)") === "bar")
    assert(eval("$(list-head '\"\tfoo,\",bar,baz')") === "\tfoo,")
    assert(eval("$(list-nth 0 '\"foo,\",\"bar\",\"baz\"')") === "foo,")
    assert(eval("$(list-nth 2 '\"foo,\",\"bar\",\"baz\"')") === "baz")
    assert(eval("$(list-nth 3 '\"foo,\",\"bar\",\"baz\"')") === "")
    assert(eval("$(list-nth -1 '\"foo,\",\"bar\",\"baz\"')") === "baz")
    assert(eval("$(list-nth -3 '\"foo,\",\"bar\",\"baz\"')") === "foo,")
    assert(eval("$(list-nth -4 '\"foo,\",\"bar\",\"baz\"')") === "")
    assert(eval("$(list-tail foo)") === "")
    assert(eval("$(list-tail foo,bar)") === "bar")
    assert(eval("$(list-tail foo,)") === "")
    assert(eval("$(list-tail ,bar)") === "")
    assert(eval("$(list-tail foo,bar,xxx, baz bad)") === "bar,xxx,baz,bad")
    assert(eval("$(list-slice 0:0 foo,bar,xxx,baz,bad)") === "")
    assert(eval("$(list-slice 0:2 foo,bar,xxx,baz,bad)") === "foo,bar")
    assert(eval("$(list-slice 1:1 foo,bar,xxx,baz,bad)") === "")
    assert(eval("$(list-slice : foo,bar,xxx,baz,bad)") === "foo,bar,xxx,baz,bad")
    assert(eval("$(list-slice 3: foo,bar,xxx,baz,bad)") === "baz,bad")
    assert(eval("$(list-slice :3 foo,bar,xxx,baz,bad)") === "foo,bar,xxx")
    assert(eval("$(list-slice -2: foo,bar,xxx,baz,bad)") === "baz,bad")
    assert(eval("$(list-slice -100: foo,bar,xxx,baz,bad)") === "foo,bar,xxx,baz,bad")
    assert(eval("$(list-slice :-2 foo,bar,xxx,baz,bad)") === "foo,bar,xxx")
    assert(eval("$(list-slice :-5 foo,bar,xxx,baz,bad)") === "")
    assert(eval("$(list-slice :-6 foo,bar,xxx,baz,bad)") === "")
    assert(eval("$(list-count foo,bar,xxx, baz bad)") === "5")
    assert(eval("$(explode ' ' foo bar xxx baz bad)") === "foo,bar,xxx,baz,bad")
    assert(eval("$(explode ';' foo;bar xxx;baz;bad)") === "foo,bar,xxx,baz,bad")
    assert(eval("$(implode ' ' foo,bar,xxx,baz,bad)") === "foo bar xxx baz bad")
    assert(eval("$(implode ' ' $(list-slice :3 foo,bar,xxx,baz,bad))") === "foo bar xxx")
    assert(eval("$(list-search almafa '')") === "")
    assert(eval("$(list-search 'foo,' '\"foo,\",\"bar\",\"baz\",\"bar\"')") === "0")
    assert(eval("$(list-search --start-index 0 --mode literal bar '\"foo,\",\"bar\",\"baz\",\"bar\"')") === "1")
    assert(eval("$(list-search --start-index 2 bar '\"foo,\",\"bar\",\"baz\",\"bar\"')") === "3")
    assert(eval("$(list-search --start-index 5 baz '\"foo,\",\"bar\",\"baz\",\"bar\"' '\"foo,\",\"bar\",\"baz\",\"bar\"')") === "6")
    assert(eval("$(list-search almafa --mode literal '\"foo,\",\"bar\",\"baz\",\"bar\"')") === "")
    assert(eval("$(list-search --start-index 0 --mode prefix fo '\"foo,\",\"bar\",\"baz\"')") === "0")
    assert(eval("$(list-search --mode prefix ba '\"foo,\",\"bar\",\"baz\"')") === "1")
    assert(eval("$(list-search --start-index 2 --mode prefix ba '\"foo,\",\"bar\",\"baz\"')") === "2")
    assert(eval("$(list-search --mode substring oo '\"foo,\",\"bar\",\"baz\"')") === "0")
    assert(eval("$(list-search --mode substring --start-index 2 a '\"foo,\",\"bar\",\"baz\"')") === "2")
    assert(eval("$(list-search --mode glob f*, '\"foo,\",\"bar\",\"baz\"')") === "0")
    assert(eval("$(list-search --mode glob --start-index 1 *az '\"foo,\",\"bar\",\"baz\"')") === "2")
    assert(eval("$(list-search --mode glob ar '\"foo,\",\"bar\",\"baz\"')") === "")
    assert(eval("$(list-search --mode pcre --start-index 0 f.*, '\"foo,\",\"bar\",\"baz\"')") === "0")
    assert(eval("$(list-search --mode pcre ^bar$$ '\"foo,\",\"bar\",\"baz\"')") === "1")
    assert(eval("$(list-search --mode pcre a...fa '\"foo,\",\"bar\",\"baz\"')") === "")
  }

  test("$(…)@N context-index suffix selects the Nth list element (test_cond_funcs @-forms)") {
    assert(eval("$(explode ; a;b;c)@0") === "a")
    assert(eval("$(explode ; a;b;c)@1") === "b")
    assert(eval("$(explode ; a;b;c)@2") === "c")
    assert(eval("$(explode ; a;b;c)@3") === "") // out of range → empty
    assert(eval("$(list-concat $lst)@1") === "b")
  }

  test("WEEK/ISOWEEK boundaries, facility names, $* match list (test_macro.c)") {
    val df = Seq(
      "2015-01-01 11:20:50", "2015-12-31 11:20:50",
      "2016-01-01 11:20:50", "2015-01-05 11:20:50")
      .toDF("tss").withColumn("ts", col("tss").cast("timestamp"))
    val r = Templates.standardResolver(df.columns.toSet + "ts", col("ts"), lit(13),
      map().cast("map<string,string>"))
    val got = df.orderBy("tss")
      .select(Templates.compile("$WEEK/$ISOWEEK", r).as("v")).as[String].collect().toSeq
    // order: 2015-01-01, 2015-01-05, 2015-12-31, 2016-01-01
    assert(got === Seq("00/01", "01/02", "52/53", "00/53"))
    // facility name: lpr = code 6 (test_macro.c test_facility)
    val lpr = Seq(6 * 8).toDF("pri")
    val rp = Templates.standardResolver(Set("pri"), lit(null).cast("timestamp"),
      col("pri"), map().cast("map<string,string>"))
    assert(lpr.select(Templates.compile("$FACILITY", rp).as("v")).as[String].head() === "lpr")
    // $* renders the matches column as a LIST (test__asterisk...)
    val dm = Seq(1).toDF("x").withColumn("matches", array(lit("foo"), lit("bar")))
    val rm = Templates.standardResolver(dm.columns.toSet, lit(null).cast("timestamp"),
      lit(13), map().cast("map<string,string>"))
    assert(dm.select(Templates.compile("$*", rm).as("v")).as[String].head() === "foo,bar")
    assert(dm.select(Templates.compile("$(list-head $*)", rm).as("v")).as[String].head() === "foo")
  }

  test("id macros (RUNID/RCPTID/UNIQID) are deterministic; $SDATA renders rfc5424 blocks") {
    val line = """<165>1 2026-03-05T06:07:08.000+00:00 h1 app 42 mid """ +
      """[ex@1 k="v" n="2"][origin ip="10.0.0.1"] payload"""
    val parsed = Seq(("conv-1", 3, line)).toDF("conv_id", "turn_idx", "text")
      .withColumn("p", graft.parsers.FieldParsers.rfc5424Parser(col("text")))
      .select(col("conv_id"), col("turn_idx"),
        col("p.pri").as("pri"), col("p.ts").as("ts"),
        col("p.sdata").as("sdata"), col("p.sdata_ids").as("sdata_ids"))
      .withColumn("fields", map(lit("host"), lit("h1")))
    val r = Templates.standardResolver(parsed.columns.toSet, col("ts"), col("pri"), col("fields"))
    def ev(t: String): String =
      parsed.select(Templates.compile(t, r).as("v")).as[String].head()
    assert(ev("$SDATA") === """[ex@1 k="v" n="2"][origin ip="10.0.0.1"]""")
    // RFC5424 6.3.3: \ " ] escaped in rendered PARAM-VALUEs
    val esc = Seq(1).toDF("x")
      .withColumn("pri", lit(13)).withColumn("ts", current_timestamp())
      .withColumn("sdata_ids", array(lit("m")))
      .withColumn("sdata", map(lit("m.q"), lit("""say "hi" \ [ok]""")))
      .withColumn("fields", map(lit("host"), lit("h")))
    val r2 = Templates.standardResolver(esc.columns.toSet, col("ts"), col("pri"), col("fields"))
    val got = esc.select(Templates.compile("$SDATA", r2).as("v")).as[String].head()
    assert(got === """[m q="say \"hi\" \\ [ok\]"]""")
    // ids derive from stable inputs — same value across evaluations
    assert(ev("$RCPTID") === ev("$RCPTID"))
    assert(ev("$RCPTID").length === 16)
    assert(ev("$UNIQID") === ev("$HOSTID") + "@" + ev("$RCPTID"))
    assert(ev("$RUNID").length === 8)
  }

  test("$(/) truncates toward zero for ints, divides doubles as doubles") {
    val df = Seq(1).toDF("x")
    val r: graft.functions.Templates.Resolver = _ => None
    def eval(t: String): String =
      df.select(graft.functions.Templates.compile(t, r).as("v")).as[String].head()
    assert(eval("$(/ -7 2)") === "-3")  // C int64 truncation, not floor(-3.5) = -4
    assert(eval("$(/ 7 2)") === "3")
    assert(eval("$(/ 7.0 2)") === "3.50000000000000000000") // double-formed → double division, %.20f
  }

  test("format-cef-extension: subkeys walk, sort, key validation, escaping (test-format-cef-extension.c)") {
    val d = Seq(("v", "c:/program files", "10.0.0.1", "a=b", "x\\y", "skipme"))
      .toDF("k", "act", "dst", "eq", "bs", "bad")
      .withColumn("fields", map(
        lit(".cef.k"), col("k"),
        lit(".cef.act"), col("act"),
        lit(".cef.dst"), col("dst"),
        lit(".cef.bad key"), col("bad"),   // non-alnum key: skipped (:58)
        lit("other.x"), col("bad")))       // outside --subkeys: excluded
    val r: Templates.Resolver = name =>
      if (d.columns.contains(name)) Some(col(name)) else None
    val got = d.select(Templates.compile(
      "$(format-cef-extension --subkeys .cef.)", r).as("v")).as[String].head()
    // sorted keys, spaces NOT escaped (:118 "act=c:/program files dst=10.0.0.1")
    assert(got === "act=c:/program files dst=10.0.0.1 k=v")

    val esc = d.withColumn("fields", map(
      lit(".cef.eq"), col("eq"), lit(".cef.bs"), col("bs")))
    val got2 = esc.select(Templates.compile(
      "$(format-cef-extension --subkeys .cef.)", r).as("v")).as[String].head()
    // = -> \= (:175), backslash -> \\ (:173)
    assert(got2 === "bs=x\\\\y eq=a\\=b")
  }

  test("format-welf --key glob walk: id first, space values quoted (format-welf.c)") {
    val d = Seq(("w7", "alma", "blocked a ping", "zz"))
      .toDF("idv", "prog", "msg", "other")
      .withColumn("fields", map(
        lit("id"), col("idv"), lit("prog"), col("prog"),
        lit("msg"), col("msg"), lit("xother"), col("other")))
    val r: Templates.Resolver = name =>
      if (d.columns.contains(name)) Some(col(name)) else None
    val all = d.select(Templates.compile("$(format-welf --key *)", r).as("v"))
      .as[String].head()
    assert(all === "id=w7 msg=\"blocked a ping\" prog=alma xother=zz")
    val globbed = d.select(Templates.compile("$(format-welf --key m*)", r).as("v"))
      .as[String].head()
    assert(globbed === "msg=\"blocked a ping\"")
  }

  test("stardate: leap-aware year fraction, truncation, digits (modules/stardate/tests)") {
    // port of test_stardate: 2012-07-15 → 2012.5 (leap year), 2013-07-01 →
    // 2013.49, 2014-01-01 → 2014.000
    val d = Seq(
      (1342310400L, 1), (1372636800L, 2), (1388534400L, 3))
      .toDF("ut", "p")
    def run(digits: Int, ut: Long): String = {
      val row = d.filter(col("ut") === ut)
      val r: Templates.Resolver = name =>
        if (name == "UNIXTIME") Some(col("ut").cast("string")) else None
      row.select(Templates.compile(s"$$(stardate --digits $digits $$UNIXTIME)", r).as("v"))
        .as[String].head()
    }
    assert(run(1, 1342310400L) === "2012.5")
    assert(run(2, 1372636800L) === "2013.49")
    assert(run(3, 1388534400L) === "2014.000")
  }

  test("graphite-output: k=v and --key glob forms (modules/graphite/tests)") {
    val d = Seq(("4", "value", 1139684315L)).toDF("dice", "appv", "ut")
      .withColumn("fields", map(lit("APP.VALUE"), col("appv"), lit(".lead"), lit("x")))
    val r: Templates.Resolver = name => name match {
      case "R_UNIXTIME" => Some(col("ut").cast("string"))
      case n if d.columns.contains(n) => Some(col(n))
      case _ => None
    }
    def run(t: String) = d.select(Templates.compile(t, r).as("v")).as[String].head()
    // :59 inline k=v form
    assert(run("$(graphite-output local.random.diceroll=$dice)")
      === "local.random.diceroll 4 1139684315\n")
    // :93 --timestamp override
    assert(run("$(graphite-output --timestamp 123 x=y)") === "x y 123\n")
    // --key glob walk + leading-dot rewrite (:93-95)
    assert(run("$(graphite-output --key APP.VALUE*)")
      === "APP.VALUE value 1139684315\n")
    assert(run("$(graphite-output --key .lead)") === "_lead x 1139684315\n")
  }

  test("getent protocols/services both directions (modules/getent)") {
    val r: Templates.Resolver = name =>
      if (df.columns.contains(name)) Some(col(name)) else None
    def run(t: String) = df.select(Templates.compile(t, r).as("v")).as[String].head()
    assert(run("$(getent protocols tcp)") === "6")
    assert(run("$(getent protocols 17)") === "udp")
    assert(run("$(getent services ssh)") === "22")
    assert(run("$(getent services 514)") === "syslog")
    assert(run("$(getent services nosuch)") === "")
  }

  test("$(dns-resolve-ip): hosts-backed resolution, fqdn/short, address fallback (ip-funcs.c)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-tdns")
    java.nio.file.Files.write(dir.resolve("hosts"),
      "10.1.2.3 web01.example.com\n# c\n10.1.2.4 db01.example.com\n".getBytes)
    val df2 = Seq(("10.1.2.3", "10.9.9.9")).toDF("ip", "miss")
    val r: Templates.Resolver =
      name => if (df2.columns.contains(name)) Some(col(name)) else None
    def ev(t: String): String =
      df2.select(Templates.compile(t, r).as("v")).as[String].head()
    assert(ev(s"$$(dns-resolve-ip --dns-cache-hosts $dir/hosts $$ip)") === "web01")
    assert(ev(s"$$(dns-resolve-ip --use-fqdn --dns-cache-hosts $dir/hosts $$ip)")
      === "web01.example.com")
    assert(ev(s"$$(dns-resolve-ip --dns-cache-hosts $dir/hosts $$miss)") === "10.9.9.9")
    assert(ev("$(dns-resolve-ip $ip)") === "10.1.2.3") // no hosts: address text
  }

  test("$(iterate): per-message accumulator chain (tf-iterate.c, test_basicfuncs.c:599)") {
    // the reference feeds 3 messages through "Some prefix $(iterate "$(+ 1 $_)" 0)"
    // and reads 0,1,2 — in batch the message sequence is a 3-row frame with
    // its 0-based position bound as __iter_idx
    val seq3 = Seq(0, 1, 2).toDF("idx")
    val r: Templates.Resolver =
      name => if (name == "__iter_idx") Some(col("idx")) else None
    val got = seq3
      .select(col("idx"),
        Templates.compile("Some prefix $(iterate \"$(+ 1 $_)\" 0)", r).as("v"))
      .orderBy("idx").as[(Int, String)].collect().map(_._2).toSeq
    assert(got === Seq("Some prefix 0", "Some prefix 1", "Some prefix 2"))
    // non-trivial f and initial: f(x)=2x+1 from 1 → 1, 3, 7
    val got2 = seq3
      .select(col("idx"),
        Templates.compile("$(iterate \"$(+ 1 $(* 2 $_))\" 1)", r).as("v"))
      .orderBy("idx").as[(Int, String)].collect().map(_._2).toSeq
    assert(got2 === Seq("1", "3", "7"))
    // outside an iteration scope the compile fails loudly
    val err = intercept[RuntimeException] {
      Templates.compile("$(iterate \"$(+ 1 $_)\" 0)", _ => None)
    }
    assert(err.getMessage.contains("iteration scope"))
  }

  test("values/names value-pairs walks and env (vp-funcs.c, misc)") {
    val d = Seq(("x", "y", "z")).toDF("a", "b", "c")
      .withColumn("fields", map(
        lit("app.one"), col("a"), lit("app.two"), col("b"), lit("other"), col("c")))
    val r: Templates.Resolver = name =>
      if (d.columns.contains(name)) Some(col(name)) else None
    def run(t: String) = d.select(Templates.compile(t, r).as("v")).as[String].head()
    assert(run("$(values app.*)") === "x,y")
    assert(run("$(names app.*)") === "app.one,app.two")
    assert(run("$(names *)") === "app.one,app.two,other")
    // composes with list functions: LIST in, LIST ops over it
    assert(run("$(list-count $(names app.*))") === "2")
    assert(run("$(env PATH)").nonEmpty)
    assert(run("$(env NO_SUCH_VAR_GRAFT)") === "")
  }

  test("$(geoip2): default db, --field paths, --database csv, miss renders empty (tfgeoip.c)") {
    // default database: 10.1.2.3 → fine /24 i=1,j=2 (country BH, city-1-2)
    assert(eval("$(geoip2 $ip)") === "BH")
    assert(eval("$(geoip2 --field city.names.en $ip)") === "city-1-2")
    assert(eval("$(geoip2 --field location.latitude $ip)") === "-82.5")
    assert(eval("$(geoip2 10.0.1.2)") === "AA") // wide /16, i=0
    assert(eval("$(geoip2 10.99.0.1)") === "")  // out-of-fixture miss → ""
    assert(eval("$(geoip2 not-an-ip)") === "")  // unparseable → "" (tfgeoip.c:149)
    val db = java.nio.file.Files.createTempFile("geodb", ".csv")
    java.nio.file.Files.writeString(db,
      "net_start,net_end,country_iso,asn\n167772160,167837695,XX,AS-TEST\n")
    try {
      assert(eval(s"$$(geoip2 --database $db 10.0.1.2)") === "XX")
      assert(eval(s"$$(geoip2 -d $db --field asn 10.0.1.2)") === "AS-TEST")
      assert(eval(s"$$(geoip2 -d $db 10.2.0.1)") === "") // past the one row
    } finally java.nio.file.Files.delete(db)
    val bad = intercept[IllegalArgumentException] {
      df.select(Templates.compile("$(geoip2 --field nope.path $ip)", resolver)).head()
    }
    assert(bad.getMessage.contains("unknown field"))
  }
}
