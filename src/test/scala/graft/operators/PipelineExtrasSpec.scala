package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Hand-computed oracles for the round-7 retrieval/sampling additions:
  * BM25 ranked retrieval, priority sampling, embedding decontamination,
  * quality-ranked cluster survivors. */
class PipelineExtrasSpec extends SparkSpecBase {
  import spark.implicits._

  /** The BM25 per-(doc,term) integer weight, independently recomputed. */
  private def bmW(tf: Long, dl: Long, df: Long, n: Long, dlTot: Long): Long = {
    val avgdl = dlTot.toDouble / n.toDouble
    val idf = 1.0 + (n.toDouble - df.toDouble + 0.5) / (df.toDouble + 0.5)
    val tfw = (tf.toDouble * 2.2) /
      (tf.toDouble + 1.2 * (0.25 + 0.75 * (dl.toDouble / avgdl)))
    math.floor(idf * tfw * 1000000.0).toLong
  }

  test("bm25TopDocs: hand-computed scores, multi-term sum, k cut") {
    val docs = Seq(
      (1L, "cat bird dog"),
      (2L, "cat cat cat dog dog dog"),
      (3L, "dog bird")
    ).toDF("doc_id", "text")
    // N=3, dl = 3/6/2 -> dlTot=11; df(cat)=2, df(bird)=2
    val exp = Map(
      1L -> (2L, bmW(1, 3, 2, 3, 11) + bmW(1, 3, 2, 3, 11)), // cat + bird
      2L -> (1L, bmW(3, 6, 2, 3, 11)),
      3L -> (1L, bmW(1, 2, 2, 3, 11)))
    val all = TextOps.bm25TopDocs(docs, "doc_id", "text",
        Seq("cat", "bird"), k = 10)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(all == exp, all)
    // k=2 keeps the two largest score_sums (deterministic id tie-break)
    val top2 = TextOps.bm25TopDocs(docs, "doc_id", "text",
        Seq("cat", "bird"), k = 2)
      .collect().map(_.getLong(0)).toSeq
    val expTop2 = exp.toSeq.sortBy { case (id, (_, s)) => (-s, id) }
      .take(2).map(_._1)
    assert(top2 == expTop2, top2)
  }

  /** mdHash31 folded to 30 bits over the salted id — the JVM-side mirror. */
  private def h30(id: Long, salt: String = "graft"): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest((salt + id.toString).getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    (java.lang.Long.parseLong(hex.take(15), 16) % (1L << 31)) % (1L << 30)
  }

  test("prioritySample: exact-k, recomputed priorities, deterministic") {
    val rows = (1L to 50L).map(i => (i, 1000000000L + i * 7L))
    val df = rows.toDF("id", "w")
    val got = Shards.prioritySample(df, "id", col("w"), k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val expected = rows
      .map { case (i, w) => (i, w, (w * 1048576L) / (h30(i) + 1L)) }
      .sortBy { case (i, _, p) => (-p, i) }.take(5)
    assert(got == expected, got)
    val again = Shards.prioritySample(df, "id", col("w"), k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(again == got)
  }

  test("prioritySampleStratified: exact-k per stratum, small strata whole") {
    val rows = (1L to 30L).map(i => (i, "a", 10L)) ++
      (31L to 60L).map(i => (i, "b", 10L)) ++
      (61L to 63L).map(i => (i, "c", 10L))
    val df = rows.toDF("id", "src", "w")
    val out = Shards.prioritySampleStratified(df, "id", "src", col("w"), 5)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(4)))
    val bySrc = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(bySrc == Map("a" -> 5, "b" -> 5, "c" -> 3), bySrc)
    assert(out.forall(_._3 <= 5))
    val again = Shards.prioritySampleStratified(df.repartition(7), "id", "src",
      col("w"), 5).collect().map(r => (r.getLong(0), r.getString(1), r.getLong(4)))
    assert(out.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
  }

  test("prioritySample: a dominating weight is always drawn") {
    val df = ((1L to 99L).map(i => (i, 1L)) :+ (999L, 1L << 40))
      .toDF("id", "w")
    val ids = Shards.prioritySample(df, "id", col("w"), k = 3)
      .collect().map(_.getLong(0)).toSet
    assert(ids.contains(999L), ids)
    assert(ids.size == 3)
  }

  test("embeddingDecontaminate: planted leak flagged, near-miss is not") {
    val corpus = Seq(
      (10L, Seq(1f, 0f)), (11L, Seq(0f, 1f)), (12L, Seq(3f, 4f))
    ).toDF("id", "vec")
    val testSet = Seq((1L, Seq(1f, 0f)), (2L, Seq(0f, 2f))).toDF("tid", "vec")
    val out = Similarity.embeddingDecontaminate(
        corpus, "id", testSet, "tid", "vec", minSim = 0.95)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getBoolean(3)))
      .toMap
    assert(out(10L) == ((1L, 1.0, true)), out(10L))   // exact copy of t1
    assert(out(11L) == ((1L, 1.0, true)), out(11L))   // direction of t2
    assert(out(12L) == ((0L, 0.8, false)), out(12L))  // (3,4)/5 vs t2 = 0.8
  }

  test("rrfFuse: hand-computed fusion of two ranked lists") {
    val a = Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("id", "rk")
    val b = Seq((2L, 1L), (3L, 2L), (4L, 3L)).toDF("id", "rk")
    val out = Retrieval.rrfFuse(Seq(a, b), "id", "rk", k0 = 60, topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // contribs: 1e6 div 61 = 16393, div 62 = 16129, div 63 = 15873
    val expected = Seq(
      (2L, 2L, 16129L + 16393L),  // rank2 in A + rank1 in B = 32522
      (3L, 2L, 15873L + 16129L),  // rank3 in A + rank2 in B = 32002
      (1L, 1L, 16393L),
      (4L, 1L, 15873L))
    assert(out == expected, out)
  }

  test("trainScoreLr: learns a planted marker; exact across partitionings") {
    val words = Seq("alpha", "beta", "gamma", "delta", "eps")
    val docs = (0L until 60L).map { i =>
      val base = (0 until 12).map(j => words(((i + j) % 5).toInt)).mkString(" ")
      val text = if (i % 3 == 0) base + " qz mark qz mark" else base
      (i, text, i % 3 == 0)
    }.toDF("doc_id", "text", "y")
    val out = Classifier.trainScoreLr(docs, "doc_id", "text", col("y"),
        buckets = 64, iters = 5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(5))).toMap
    val acc = out.values.count(_._2).toDouble / out.size
    assert(acc >= 0.95, f"classifier failed to learn the marker: acc=$acc%.2f")
    // integer-staged training is a pure function of the data — identical
    // logits under a different partitioning (the float-GD failure mode)
    val out2 = Classifier.trainScoreLr(docs.repartition(7), "doc_id", "text",
        col("y"), buckets = 64, iters = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.map { case (k, v) => k -> v._1 } == out2)
  }

  /** Reference BPE apply (pairwise scan, rank order) — the published
    * algorithm, independently implemented. */
  private def refEncode(word: String, merges: Seq[(String, String)]): Seq[String] = {
    var syms: Seq[String] = word.map(_.toString)
    for ((a, b) <- merges) {
      val out = scala.collection.mutable.ArrayBuffer[String]()
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
          out += (a + b); i += 2
        } else { out += syms(i); i += 1 }
      }
      syms = out.toSeq
    }
    syms
  }

  test("BPE encode matches a reference implementation under trained merges") {
    val docs = Seq(
      (1L, "low low low lower lower"),
      (2L, "newest newest newest widest widest"),
      (3L, "lowest newest aaaaa"),
      (4L, "")
    ).toDF("doc_id", "text")
    val mergesDf = Bpe.train(docs, "text", nMerges = 10)
    val merges = mergesDf.orderBy("rank").select("left", "right")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(merges.nonEmpty)

    val pieces = Bpe.encodePieces(docs, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSeq).toMap
    val counts = Bpe.encodeCounts(docs, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    for ((id, text) <- Seq(1L -> "low low low lower lower",
        2L -> "newest newest newest widest widest",
        3L -> "lowest newest aaaaa", 4L -> "")) {
      val words = text.split("\\s+").filter(_.nonEmpty).toSeq
      val ref = words.flatMap(w => refEncode(w, merges))
      assert(pieces(id) == ref, s"doc $id: ${pieces(id)} vs $ref")
      assert(counts(id) == ((words.size.toLong, ref.size.toLong)), s"doc $id")
    }
  }

  test("bpe_piece_count == size(bpe_pieces) on fuzz words (interned-int fold parity)") {
    val merges = Seq("l" -> "o", "lo" -> "w", "e" -> "s", "es" -> "t",
      "n" -> "e", "ne" -> "w", "a" -> "a", "aa" -> "aa", "w" -> "est",
      "é" -> "é") // incl. self-pairs, chained results, multibyte
    val flat = merges.flatMap(p => Seq(p._1, p._2))
    val rnd = new scala.util.Random(11)
    val alphabet = "lowestnewidaé🙂"
    val words = (0 until 2000).map { i =>
      (i.toLong, (0 until (1 + rnd.nextInt(12)))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    } :+ ((9999L, ""))
    val df = words.toDF("id", "w").filter(length(col("w")) > 0)
    val bad = df.select(col("id"), col("w"),
        call_function("bpe_piece_count", col("w"), typedLit(flat)).as("k"),
        size(call_function("bpe_pieces", col("w"), typedLit(flat))).cast("long").as("s"))
      .filter(col("k") =!= col("s"))
      .take(5)
    assert(bad.isEmpty, "piece-count mismatches:\n" + bad.mkString("\n"))
  }

  test("md5_prefix60 kernel equals the conv(substring(md5)) chain bit-for-bit") {
    val df = Seq("", "a", "graft42", "the quick brown fox", "qz mark",
      "é中文 mixed", "x" * 500).toDF("s")
    val cmp = df.select(
        call_function("md5_prefix60", col("s")).as("fast"),
        conv(substring(md5(col("s")), 1, 15), 16, 10).cast("long").as("ref"))
      .collect()
    cmp.foreach(r => assert(r.getLong(0) == r.getLong(1), r))
  }

  test("gram_score kernel equals the replace length-delta chain") {
    // overlap semantics ("aaa" under "aa" counts ONE non-overlapping hit),
    // multibyte text, empty text, gram-at-boundaries
    val df = Seq("aaa", "aa aa", "", " the then th", "ééé xé é", "ab").toDF("s")
    val grams = Seq("aa", " th", "é", "ab")
    val refCol = grams.map(g =>
      length(col("s")) - length(call_function("replace", col("s"), lit(g))): org.apache.spark.sql.Column)
      .reduce(_ + _)
    val cmp = df.select(
        call_function("gram_score", (col("s") +: grams.map(g => lit(g): org.apache.spark.sql.Column)): _*).as("fast"),
        refCol.cast("long").as("ref"))
      .collect()
    cmp.foreach(r => assert(r.getLong(0) == r.getLong(1), r))
  }

  test("winnow_fps kernel equals the staged charCodes|>kgramHashes|>winnow chain") {
    val df = Seq("", "short", "abcdefgh", "abcdefghijk",
      "the quick brown fox jumps over the lazy dog and runs on",
      "aaaaaaaaaaaaaaaaaa", "é accented çhars repeated é accented çhars")
      .toDF("text")
    val cmp = df.select(
        TextOps.winnowFingerprints(col("text")).as("fast"),
        TextOps.winnowFromKgrams(
          TextOps.kgramHashes(TextOps.charCodes(col("text")))).as("ref"))
      .collect()
    cmp.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1), r))
  }

  test("pq_encode kernel: argmin per subspace, lowest-cid ties, exact distances") {
    // 2 subspaces x 3 codes x 2 dims; vector picks code 2 then code 0;
    // an exact tie (two identical codebook rows) must take the LOWER cid
    val cbs: Seq[Seq[Seq[Double]]] = Seq(
      Seq(Seq(0.0, 0.0), Seq(1.0, 1.0), Seq(5.0, 5.0)),
      Seq(Seq(2.0, 2.0), Seq(2.0, 2.0), Seq(9.0, 9.0)))
    val df = Seq((1L, Seq(5.1, 4.9, 2.0, 2.0))).toDF("id", "vec")
    val codes = df.select(Quantize.pqEncode(col("vec"), cbs).as("codes"))
      .head().getSeq[Int](0)
    assert(codes == Seq(2, 0), codes)
  }

  test("containmentPairs: subset dup at containment 1.0, jaccard far below") {
    val docs = Seq(
      (1L, "a b c d e f"), // 4 shingles
      (2L, "a b c"),       // 1 shingle, fully contained in doc 1
      (3L, "x y z w")      // unrelated
    ).toDF("doc_id", "text")
    val out = Dedup.containmentPairs(docs, "doc_id", "text", n = 3,
        minContainment = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6)))
    assert(out.toSeq == Seq((1L, 2L, 1L, 4L, 1L, 1.0, 0.25)), out.toSeq)
  }

  test("keepBestQuality: quality beats min-id; singletons keep") {
    val docs = Seq(
      (1L, "!!!! ???? ;;;; ::::"), // punctuation soup -> near-zero quality
      (2L, "the cat sat on the mat with a dog and a fish for fun"),
      (3L, "another solo document")
    ).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")
    val out = Dedup.keepBestQuality(docs, "doc_id", "text", pairs)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(4),
        r.getBoolean(5)))
      .toMap
    assert(out(1L) == ((1L, 2L, 2L, false)), out(1L)) // min-id LOSES on quality
    assert(out(2L) == ((1L, 2L, 1L, true)), out(2L))
    assert(out(3L) == ((3L, 1L, 1L, true)), out(3L))
  }
}
