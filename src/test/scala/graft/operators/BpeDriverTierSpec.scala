package graft.operators

import graft.SparkSpecBase

/** Tier parity for [[Bpe.train]]: the bounded-type-table DRIVER tier must
  * produce a merge table bit-identical to the distributed loop — same
  * argmax, same (count DESC, left ASC, right ASC) tie-break under UTF-8
  * binary order, same left-to-right non-overlapping merge application,
  * same early stop — on adversarial input (ties, repeats, non-ASCII,
  * supplementary-plane code points, single-char words). */
class BpeDriverTierSpec extends SparkSpecBase {
  import spark.implicits._

  private def parity(docs: Seq[String], nMerges: Int, minCount: Long = 2L): Unit = {
    val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val driver = Bpe.train(df, "text", nMerges, minCount)
      .orderBy("rank").collect().toSeq
    val dist = Bpe.train(df, "text", nMerges, minCount, driverTypeMax = 0L)
      .orderBy("rank").collect().toSeq
    assert(driver == dist,
      s"tier mismatch:\n driver: ${driver.mkString("; ")}\n dist:   ${dist.mkString("; ")}")
  }

  test("driver tier == distributed tier on the Sennrich example corpus") {
    parity(Seq("low low low low low lower lower newest newest newest",
      "newest newest newest widest widest widest"), nMerges = 6)
  }

  test("tier parity on tie-heavy and overlapping-run input") {
    parity(Seq("aaaa aaaa aa baba abab bb",
      "cc cc dd dd cd cd dc dc", "aaaa baba"), nMerges = 8, minCount = 1L)
  }

  test("tier parity on non-ASCII and supplementary-plane code points") {
    // 😀 (U+1F600) is a surrogate pair in UTF-16: java.lang.String order
    // and UTF-8 binary order DISAGREE around it vs U+FF01 — this input
    // catches a driver tier that tie-breaks with String.compareTo
    parity(Seq("héllo héllo wörld wörld wörld 日本 日本 日本語",
      "😀a 😀a 😀a ！b ！b ！b xx 😀！ 😀！"), nMerges = 10, minCount = 1L)
  }

  test("tier parity on early stop (no pair reaches minCount)") {
    parity(Seq("ab cd ef", "gh ij kl"), nMerges = 5, minCount = 3L)
  }

  test("encodeCounts: map-side fold tier == type-join tier, incl. empty docs") {
    val df = Seq((1L, "low low lower newest"), (2L, "widest newest newest"),
      (3L, ""), (4L, "   "), (5L, "low")).toDF("doc_id", "text")
    val merges = Seq(("l", "o"), ("lo", "w"), ("n", "e"), ("ne", "w"))
    // padding with never-matching pairs pushes the list over the 64-merge
    // threshold WITHOUT changing any fold result — same values, long tier
    val padded = merges ++ (0 until 65).map(i => (s"$i", ""))
    val short = Bpe.encodeCounts(df, "doc_id", "text", merges)
      .orderBy("doc_id").collect().toSeq
    val long = Bpe.encodeCounts(df, "doc_id", "text", padded)
      .orderBy("doc_id").collect().toSeq
    assert(short == long,
      s"tier mismatch:\n short: ${short.mkString("; ")}\n long:  ${long.mkString("; ")}")
    // token-less docs survive with zero counts in BOTH tiers
    assert(short.filter(r => r.getLong(0) == 3L || r.getLong(0) == 4L)
      .forall(r => r.getLong(1) == 0L && r.getLong(2) == 0L), short.toString)
  }

  test("trainEncodeCounts == train + encodeWithTrained (shared-scan composite)") {
    val df = Seq((1L, "low low low lower newest newest"),
      (2L, "widest widest newest newest"), (3L, ""), (4L, "low"))
      .toDF("doc_id", "text")
    val twoCall = Bpe.encodeWithTrained(df, "doc_id", "text",
        Bpe.train(df, "text", 6, minCount = 1L))
      .orderBy("doc_id").collect().toSeq
    val composite = Bpe.trainEncodeCounts(df, "doc_id", "text", 6, minCount = 1L)
      .orderBy("doc_id").collect().toSeq
    assert(composite == twoCall,
      s"composite: ${composite.mkString("; ")}\n two-call: ${twoCall.mkString("; ")}")
  }

  test("trainEncodeCounts long-merge-list tier == two-call form AND reads " +
    "the shared per-doc cache (ADVICE r9)") {
    // enough distinct adjacent pairs that training sustains >64 merges
    val words = for (a <- 'a' to 'j'; b <- 'a' to 'j') yield s"$a${b}q$a$b"
    val df = (Seq((0L, ""), (1L, "   ")) ++ words.zipWithIndex.map {
      case (w, i) => (i + 2L, s"$w $w zz")
    }).toDF("doc_id", "text")
    val mergesDf = Bpe.train(df, "text", 70, minCount = 1L)
    assert(mergesDf.count() > 64L, "corpus must sustain >64 merges")
    val twoCall = Bpe.encodeWithTrained(df, "doc_id", "text", mergesDf)
      .orderBy("doc_id").collect().toSeq
    val composite = Bpe.trainEncodeCounts(df, "doc_id", "text", 70, minCount = 1L)
    val got = composite.orderBy("doc_id").collect().toSeq
    assert(got == twoCall,
      s"long-tier composite mismatch:\n got: ${got.mkString("; ")}\n want: ${twoCall.mkString("; ")}")
    // the fix itself: the long tier must FEED FROM the persisted perDocWord
    // (an InMemoryTableScan in the plan), not re-run the corpus tokenize
    // while the cache sits unread
    val plan = composite.queryExecution.executedPlan.toString
    assert(plan.contains("InMemoryTableScan"),
      s"long tier does not read the shared per-doc cache:\n$plan")
    // token-less docs survive with zero counts in the long tier too
    assert(got.take(2).forall(r => r.getLong(1) == 0L && r.getLong(2) == 0L))
  }

  test("encodeWithTrained is tier-independent") {
    val df = Seq((1L, "low low lower newest"), (2L, "widest newest newest"))
      .toDF("doc_id", "text")
    val a = Bpe.encodeWithTrained(df, "doc_id", "text",
        Bpe.train(df, "text", 5, minCount = 1L))
      .orderBy("doc_id").collect().toSeq
    val b = Bpe.encodeWithTrained(df, "doc_id", "text",
        Bpe.train(df, "text", 5, minCount = 1L, driverTypeMax = 0L))
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
  }
}
