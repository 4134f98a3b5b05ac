package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Bit-parity of `token_stats` / `gopher_stats` against the staged HOF
  * chains they replaced, over fuzz built from tokenization edge cases:
  * non-space whitespace at the ends (empty lead/trail tokens), all-space
  * docs, repeated tokens and bigrams, multi-byte codepoints inside and
  * between tokens, bullets/ellipses/symbol runs, case-variant stopwords. */
class TokenStatsKernelSpec extends SparkSpecBase {
  import spark.implicits._

  private val frags: Array[String] = Array(
    "the the the", "a a b b b", "of and to in", "is on for with",
    "The THE tHe", "Be THAT Have WITH", "word", "Word word WORD",
    "", " ", "  ", "\t", "\t\t", "\r", "x\ty", "a\nb", " lead", "trail ",
    "\tlead", "trail\t", "a b a b a b", "one two one two", "x", "xy xz x",
    "café café", "日本語 日本語", "naïve test", "ü ü ü", "emoji🙂 emoji🙂",
    "a.b,c;d:e!f?g", "...", ".....", "# ## #", "a...b", "end...", "end…",
    "- bullet", "* star", "• dot", "-dash", " - spaced bullet",
    "line one\nline two\n- third\n...", "…", "#", "a#b...c",
    "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10", "the quick brown fox", "_und_ _und_")

  private def fuzz(seed: Long, rows: Int, maxFrags: Int,
                   sep: String*): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    (0 until rows).map { i =>
      val k = 1 + rnd.nextInt(maxFrags)
      val s = (0 until k).map(_ => frags(rnd.nextInt(frags.length)))
        .mkString(sep(rnd.nextInt(sep.length)))
      (i.toLong, s)
    }
  }

  test("token_stats == staged chains on adversarial fuzz") {
    val df = fuzz(seed = 51, rows = 4000, maxFrags = 6, " ", "", "\t", "\n", ". ")
      .toDF("id", "text")
    val t = TextOps.tokens($"text")
    val bad = df.select($"id", $"text", TextOps.tokenStats($"text").as("k"),
        size(t).cast("long").as("nt"),
        size(array_distinct(t)).cast("long").as("nd"),
        TextOps.maxMultiplicity(t).as("mm"),
        TextOps.maxMultiplicity(TextOps.wordBigrams(t)).as("mb"),
        aggregate(t, lit(0L), (a, x) => a + length(x).cast("long")).as("sl"),
        size(filter(t, x => array_contains(
          array(TextOps.Stopwords.map(lit): _*), x))).cast("long").as("ns"),
        TextOps.bpeishTokenCount($"text").cast("long").as("nu"),
        length(regexp_replace($"text", "[^.,;:!?]", "")).cast("long").as("np"),
        length($"text").cast("long").as("nc"))
      .filter($"k.n_tokens" =!= $"nt" || $"k.n_distinct" =!= $"nd" ||
        $"k.max_mult" =!= $"mm" || $"k.max_bigram_mult" =!= $"mb" ||
        $"k.sum_token_len" =!= $"sl" || $"k.n_stopwords" =!= $"ns" ||
        $"k.n_units" =!= $"nu" || $"k.n_punct" =!= $"np" ||
        $"k.n_chars" =!= $"nc")
      .take(5)
    assert(bad.isEmpty, "token_stats mismatches:\n" + bad.mkString("\n"))
  }

  test("gopher_stats == staged gopherRules on adversarial fuzz") {
    val df = fuzz(seed = 52, rows = 3000, maxFrags = 6, " ", "\n", "", "\n- ")
      .toDF("doc_id", "text")
    val k = TextOps.gopherRules(df, "doc_id", "text")
    val s = TextOps.gopherRulesStaged(df, "doc_id", "text")
    val cols = Seq("n_words", "n_word_chars", "n_lines", "n_bullet",
      "n_ellipsis_end", "n_symbols", "n_alpha_words", "n_stopwords", "keep")
    val bad = k.as("k").join(s.as("s"), "doc_id")
      .filter(cols.map(c => col(s"k.$c") =!= col(s"s.$c")).reduce(_ || _))
      .take(5)
    assert(bad.isEmpty, "gopher_stats mismatches:\n" + bad.mkString("\n"))
  }

  test("kernel-backed qualityScore/stopwordRatio match the staged forms") {
    val df = fuzz(seed = 53, rows = 2000, maxFrags = 5, " ", "\n", "")
      .toDF("id", "text")
    val bad = df.select($"id",
        TextOps.qualityScore($"text").as("q"),
        TextOps.qualityScoreStaged($"text").as("q0"),
        TextOps.stopwordRatio($"text").as("r"),
        TextOps.stopwordRatioStaged($"text").as("r0"))
      .filter($"q" =!= $"q0" || $"r" =!= $"r0") // exact double equality
      .take(5)
    assert(bad.isEmpty, "quality mismatches:\n" + bad.mkString("\n"))
  }
  test("gram_fps60 == staged md5-prefix transform chain on fuzz") {
    val df = fuzz(seed = 97, rows = 4000, maxFrags = 8, " ", "", "\t", "\n", ". ")
      .toDF("id", "text")
    for (k <- Seq(1, 2, 8)) {
      val t = TextOps.tokens($"text")
      val staged = when(size(t) >= k,
        transform(sequence(lit(0), size(t) - k),
          i => conv(substring(md5(concat_ws(" ",
            (0 until k).map(j => element_at(t, i + j + 1)): _*)), 1, 15), 16, 10)
            .cast("long")))
        .otherwise(array().cast("array<long>"))
      val bad = df.select($"id",
          call_function("gram_fps60", TextOps.tokens($"text"), lit(k)).as("kern"),
          staged.as("stag"))
        .filter(not($"kern" <=> $"stag"))
      assert(bad.isEmpty, s"k=$k: ${bad.take(3).mkString("; ")}")
    }
  }
}

/** Parity of the GEMM-in-group `block_cosine_pairs` kernel against the
  * blocked self-join form, including zero-norm vectors (NaN-greatest
  * comparison semantics) and duplicate ids (never pair). */
class BlockCosinePairsSpec extends SparkSpecBase {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("kernel pairs == self-join pairs on random blocks") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 400).map { i =>
      val blk = i % 7
      val v = Array.fill(16)((rnd.nextInt(2000) - 1000) / 250.0f)
      (i.toLong, blk, v)
    }
    val df = rows.toDF("vec_id", "label", "embedding")
    val k = Similarity.cosineNearDupBlocked(df, "vec_id", "embedding", "label", 0.35)
      .orderBy("id_a", "id_b").collect().toSeq
    val s = Similarity.cosineNearDupBlockedStaged(df, "vec_id", "embedding", "label", 0.35)
      .orderBy("id_a", "id_b").collect().toSeq
    assert(k.size == s.size, s"sizes: kernel ${k.size} vs staged ${s.size}")
    k.zip(s).foreach { case (a, b) => assert(a == b, s"$a != $b") }
    assert(k.nonEmpty)
  }

  test("zero-norm rows never pair (the ANSI join form would throw on them)") {
    val df = Seq(
      (1L, 0, Array(1.0f, 0f)), (2L, 0, Array(2.0f, 0f)),
      (3L, 0, Array(0.0f, 0f)), (4L, 0, Array(0.0f, 0f)))
      .toDF("vec_id", "label", "embedding")
    val k = Similarity.cosineNearDupBlocked(df, "vec_id", "embedding", "label", 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(k == Seq((1L, 2L))) // only the two nonzero vectors pair
  }

  test("duplicate ids inside one block never pair (join a.id < b.id)") {
    val df = Seq(
      (1L, 0, Array(1.0f, 0f)), (1L, 0, Array(1.0f, 0f)), (2L, 0, Array(1.0f, 0f)))
      .toDF("vec_id", "label", "embedding")
    val k = Similarity.cosineNearDupBlocked(df, "vec_id", "embedding", "label", 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val s = Similarity.cosineNearDupBlockedStaged(df, "vec_id", "embedding", "label", 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(k == s)
    assert(k == Seq((1L, 2L), (1L, 2L))) // two id-1 rows each pair id-2, 1-1 never
  }
}
