package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Bit-parity of the byte-scan kernels (`pii_scan`, `encoding_stats`,
  * `line_filter_stats`) against the regex/HOF chains they replaced, over
  * adversarial fuzz built from the fragments the matchers care about:
  * boundary-adjacent digits, over-long octets/runs, '+'-prefixed digit
  * soup, parens, suffix words with and without trailing word chars,
  * mojibake byte sequences, C0 controls, U+FFFD, multi-byte UTF-8
  * neighbors. Any semantic gap between a hand-rolled scanner and Java
  * regex shows up here as a value diff. */
class TextScanKernelSpec extends SparkSpecBase {
  import spark.implicits._

  private val frags: Array[String] = Array(
    // email-ish
    "a@b.co", "a@b.c", "x.y+z%w@sub.domain.org", "@nope", "no@", "a@@b.cc",
    "a@b..cc", "1.2.3.4a@b.co", "user@ex.io.", ".x@y.zz", "a@b-c.dd",
    "a@-.ee", "tail@dom.c0m", "x@y.z.w.vv", "u@h.museum",
    // ip-ish
    "1.2.3.4", "10.0.0.1", "999.999.999.999", "1234.5.6.7", "1.2.3.4.5",
    "1.2.3.45678", "a1.2.3.4", "1.2.3.4b", "1.2.3.", "256.1.1.1",
    "0.0.0.0", "1.22.333.4444",
    // phone-ish
    "+1 555 0100", "+49-555-0101", "+1 (555) 123-4567", "(212) 555-0199",
    "(212)555-0199", "555-123-4567", "555 123 4567", "+44 20 7946 0958",
    "12345-123-45678", "+123 456 789 0123", "+1234 555 0100", "555-123-456",
    "(12) 345-6789", "+1-(555)-123-4567", "x555-123-4567", "555-123-4567y",
    "+7 800 555 35 35", "+1 555 12345",
    // address-ish
    "42 Oak Street", "42 oak street", "123456 Oak Street", "9 Elm St",
    "9 Elm Sts", "10 Maple Avenue", "10 Maple Aven", "77 Pine Blvd",
    "77 Pine Blvde", "3 A Road", "3 Ab Rd", "55 Cedar Lane today",
    "55 Cedar Ln.", "1 Big Drive", "2 Old Dr_", "8 Birch Boulevard",
    // encoding artifacts
    "�", "��", "Ã©", "â",
    "Â ", "Ã", "â", "", "",
    "\tok\r", "café", "naïve", "日本語", "ü", "emoji🙂end",
    // line-filter shapes
    "\n", "\n\n", "HOME", "3 likes", "share", "NAV MENU HOME LOGIN",
    "THIS IS ALL CAPS", "normal line with words", "  spaced  ", "\tTabbed\t",
    "Mixed CASE Line here", "a b", "a b c", "a b c d",
    // glue
    " ", "", "-", ".", "..", "word", "Word", "_", "()", "+",
    "0", "12", "345", "6789", "context text around")

  private def fuzz(seed: Long, rows: Int, maxFrags: Int,
                   sep: String*): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    (0 until rows).map { i =>
      val k = 1 + rnd.nextInt(maxFrags)
      val s = (0 until k).map { _ =>
        frags(rnd.nextInt(frags.length))
      }.mkString(sep(rnd.nextInt(sep.length)))
      (i.toLong, s)
    }
  }

  test("pii_scan == staged regex chain on adversarial fuzz") {
    val df = fuzz(seed = 41, rows = 4000, maxFrags = 6, " ", "", "-", "\n", ".")
      .toDF("id", "text")
    val bad = df.select($"id", $"text", Pii.scan($"text").as("k"))
      .withColumn("e0", Pii.emailCountStaged($"text"))
      .withColumn("i0", Pii.ipv4CountStaged($"text"))
      .withColumn("p0", Pii.phoneCountStaged($"text"))
      .withColumn("a0", Pii.addressCountStaged($"text"))
      .withColumn("r0", Pii.redactStaged($"text"))
      .filter($"k.n_emails" =!= $"e0" || $"k.n_ips" =!= $"i0" ||
        $"k.n_phones" =!= $"p0" || $"k.n_addresses" =!= $"a0" ||
        $"k.redacted" =!= $"r0")
      .select($"text", $"k", $"e0", $"i0", $"p0", $"a0", $"r0")
      .take(5)
    assert(bad.isEmpty, "kernel/regex mismatches:\n" + bad.mkString("\n"))
  }

  test("encoding_stats == staged chain on adversarial fuzz") {
    val df = fuzz(seed = 42, rows = 4000, maxFrags = 6, " ", "", "x")
      .toDF("id", "text")
    val bad = df.select($"id", $"text",
        TextOps.encodingArtifacts($"text").as("k"),
        TextOps.encodingArtifactsStaged($"text").as("s"))
      .filter($"k.n_replacement" =!= $"s.n_replacement" ||
        $"k.n_control" =!= $"s.n_control" ||
        $"k.n_mojibake" =!= $"s.n_mojibake" ||
        $"k.looks_clean" =!= $"s.looks_clean")
      .take(5)
    assert(bad.isEmpty, "kernel/staged mismatches:\n" + bad.mkString("\n"))
  }

  test("line_filter_stats == staged chain on adversarial fuzz") {
    val rowsDf = fuzz(seed = 43, rows = 3000, maxFrags = 8, "\n", " ", "\n\n")
      .toDF("doc_id", "text")
    val k = TextOps.lineFilterRebuild(rowsDf, "doc_id", "text")
    val s = TextOps.lineFilterRebuildStaged(rowsDf, "doc_id", "text")
    val bad = k.as("k").join(s.as("s"), "doc_id")
      .filter(col("k.text_kept") =!= col("s.text_kept") ||
        col("k.n_kept_lines") =!= col("s.n_kept_lines") ||
        col("k.kept") =!= col("s.kept"))
      .take(5)
    assert(bad.isEmpty, "kernel/staged mismatches:\n" + bad.mkString("\n"))
  }

  test("line_filter_stats honors a non-default minTokens") {
    val df = Seq((1L, "one two\nthree four five\nsix")).toDF("doc_id", "text")
    val k = TextOps.lineFilterRebuild(df, "doc_id", "text", minTokens = 2)
    val s = TextOps.lineFilterRebuildStaged(df, "doc_id", "text", minTokens = 2)
    assert(k.collect().toSeq == s.collect().toSeq)
  }
}
