package graft.operators

import graft.SparkSpecBase

/** Hand-computed oracle for the exact-substring dedup tier (Lee et al.
  * suffix-array recipe, re-expressed as positional k-gram cut spans).
  * Every expected value below is worked out by hand from the contract:
  * a >= k-token run occurring twice corpus-wide survives only at its
  * lowest (doc_id, pos); cut spans are per-gram [pos, pos+k), merged. */
class DedupSubstringsSpec extends SparkSpecBase {
  import spark.implicits._

  test("substring dedup cuts non-first duplicated runs, merges overlaps") {
    val df = Seq(
      (1L, "a b c d e"),         // first occurrence of "a b c d e" — kept whole
      (2L, "x a b c d y"),       // grams "a b c"@1 + "b c d"@2 dup vs doc 1
                                 //   -> merged cut [1,5), keeps "x y"
      (3L, "a b c d e"),         // exact copy: spans [0,3)+[1,4)+[2,5) -> [0,5)
      (4L, "p q"),               // shorter than k: no grams, untouched
      (5L, "m n o z m n o"),     // WITHIN-doc dup: "m n o"@0 and @4; first
                                 //   is @0, cut [4,7) -> "m n o z"
      (6L, "a b c z c d e")      // two DISJOINT cut islands [0,3) and [4,7)
                                 //   with survivor "z" between them
    ).toDF("doc_id", "text")
    val out = Dedup.dedupSubstrings(df, "doc_id", "text", k = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == (("a b c d e", 5L, 0L)))
    assert(out(2L) == (("x y", 2L, 4L)))
    assert(out(3L) == (("", 0L, 5L)))
    assert(out(4L) == (("p q", 2L, 0L)))
    assert(out(5L) == (("m n o z", 4L, 3L)))
    assert(out(6L) == (("z", 1L, 6L)))
  }

  test("corpus with no >=k-token repeats passes through unchanged") {
    val df = Seq(
      (1L, "one two three four"),
      (2L, "five six seven eight"),
      (3L, "one two nine ten")   // shares only a 2-token run; k=3 ignores it
    ).toDF("doc_id", "text")
    val out = Dedup.dedupSubstrings(df, "doc_id", "text", k = 3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "one two three four")
    assert(out(2L) == "five six seven eight")
    assert(out(3L) == "one two nine ten")
  }
}
