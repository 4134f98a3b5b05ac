package graft.streaming

import java.sql.Timestamp
import graft.SparkSpecBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

class StreamingDedupSpec extends SparkSpecBase {

  case class Doc(doc_id: Long, ts: Timestamp, text: String)

  test("streaming exact dedup keeps one doc per fingerprint, matching batch distinct") {
    import spark.implicits._

    // documents table with a synthetic arrival time (doc_id order)
    val docs = graft.Tables.documents(spark, sf("sf0.001"))
      .select(col("doc_id"), col("text"))
      .collect().map(r => Doc(r.getLong(0),
        new Timestamp(1700000000000L + r.getLong(0) * 1000L), r.getString(1)))
      .toSeq

    // sf0.001 documents are all distinct — inject exact copies (recopied
    // ids, slightly later arrival within the watermark) to dedup away
    val dups = docs.take(20).map(d =>
      d.copy(doc_id = d.doc_id + 100000L, ts = new Timestamp(d.ts.getTime + 5000L)))
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Doc]
    val q = StreamingDedup.dedupExactStream(mem.toDF(), "ts", "text", "10 minutes")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    val (b1, b2) = docs.splitAt(docs.size / 2)
    mem.addData((b1 ++ dups.take(10)): _*) // 10 dups in the same batch
    q.processAllAvailable()
    mem.addData((b2 ++ dups.drop(10)): _*) // 10 dups across batches
    q.processAllAvailable()
    q.stop()

    val kept = spark.table("dedup_out")
    val batchFps = graft.Tables.documents(spark, sf("sf0.001"))
      .select(md5(col("text")).as("fp")).distinct()
      .collect().map(_.getString(0)).toSet

    // exactly one survivor per distinct fingerprint, covering all of them
    val keptFps = kept.select("fp").collect().map(_.getString(0))
    assert(keptFps.length == keptFps.distinct.length, "duplicate fingerprint kept")
    assert(keptFps.toSet == batchFps,
      s"${keptFps.length} kept vs ${batchFps.size} distinct fingerprints")
    // all 20 injected duplicates were dropped
    assert(keptFps.length == docs.size)
  }

  test("streaming snapshot dedup: corpus-seen dropped pre-state, batch parity") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sf("sf0.001"))
      .select(col("doc_id"), col("text"), col("source"))
      .collect().map(r => (Doc(r.getLong(0),
        new Timestamp(1700000000000L + r.getLong(0) * 1000L), r.getString(1)),
        r.getString(2)))
    // snapshot = src0 docs (plus one injected in-snapshot dup); corpus =
    // fingerprints of everything else plus a copy of one snapshot text
    val snapDocs = docs.filter(_._2 == "src0").map(_._1)
    val inDup = snapDocs.head.copy(doc_id = 800001L,
      ts = new Timestamp(snapDocs.head.ts.getTime + 5000L))
    val corpusTexts = (docs.filter(_._2 != "src0").map(_._1.text) :+
      snapDocs(1).text).toSeq
    val corpusFps = corpusTexts.toDF("t").select(md5(col("t")).as("fp"))
      .distinct().cache()

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Doc]
    val q = StreamingDedup.snapshotDedupStream(mem.toDF(), corpusFps,
      "ts", "text", "10 minutes")
      .writeStream.format("memory").queryName("snap_out")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    val all = (snapDocs :+ inDup).sortBy(_.ts.getTime)
    val (b1, b2) = all.splitAt(all.size / 2)
    mem.addData(b1: _*); q.processAllAvailable()
    mem.addData(b2: _*); q.processAllAvailable()
    q.stop()

    val kept = spark.table("snap_out").select("doc_id").as[Long]
      .collect().toSet
    val batch = graft.operators.Dedup.snapshotDedup(
      (snapDocs :+ inDup).toSeq.map(d => (d.doc_id, d.text))
        .toDF("doc_id", "text"), corpusFps,
      "doc_id", "text").select("doc_id").as[Long].collect().toSet
    assert(kept == batch, s"stream $kept vs batch $batch")
    // the corpus-seen text and the in-snapshot dup are both gone
    assert(!kept.contains(snapDocs(1).doc_id) && !kept.contains(800001L))
  }

  test("streaming corpus card: windowed per-source stats match batch groupBy") {
    import spark.implicits._
    case class SDoc(doc_id: Long, ts: Timestamp, source: String, text: String)
    val base = 1700000000000L
    val rows = graft.Tables.documents(spark, sf("sf0.001"))
      .select(col("doc_id"), col("source"), col("text"))
      .collect().map { r =>
        // spread docs across two 1-minute windows by id parity
        val t = base + (r.getLong(0) % 2) * 60000L + (r.getLong(0) % 7) * 100L
        (r.getLong(0), new Timestamp(t), r.getString(1), r.getString(2))
      }.toSeq

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String, String)]
    val stream = StreamingDedup.corpusCardStream(
      mem.toDF().toDF("doc_id", "ts", "source", "text"),
      "ts", "source", "text", watermark = "1 minute", windowDur = "1 minute")
    val q = stream.writeStream.format("memory").queryName("card_out")
      .outputMode("complete").trigger(Trigger.ProcessingTime(0)).start()
    val (b1, b2) = rows.splitAt(rows.size / 2)
    mem.addData(b1: _*); q.processAllAvailable()
    mem.addData(b2: _*); q.processAllAvailable()
    q.stop()

    val got = spark.table("card_out")
      .select(col("window.start").cast("long").as("w"), col("source"),
        col("n_docs"), col("n_tokens"), col("n_short"))
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val exp = rows.toDF("doc_id", "ts", "source", "text")
      .groupBy(window(col("ts"), "1 minute"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(graft.operators.TextOps.tokenCount(col("text")).cast("long"))
          .as("n_tokens"),
        sum(when(graft.operators.TextOps.tokenCount(col("text")) < 20, 1L)
          .otherwise(0L)).as("n_short"))
      .select(col("window.start").cast("long").as("w"), col("source"),
        col("n_docs"), col("n_tokens"), col("n_short"))
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got == exp, s"${got.size} stream rows vs ${exp.size} batch rows")
  }

  test("streaming curation: encoding + quality gates before dedup, batch parity") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sf("sf0.001"))
      .select(col("doc_id"), col("text"))
      .collect().map(r => Doc(r.getLong(0),
        new Timestamp(1700000000000L + r.getLong(0) * 1000L), r.getString(1)))
      .toSeq
    // plant the three failure classes the gates exist for: mojibake text,
    // a replacement-char casualty, and an exact duplicate of a clean doc
    val moji = docs.head.copy(doc_id = 900001L,
      ts = new Timestamp(docs.head.ts.getTime + 1000L),
      text = docs.head.text + " " + graft.operators.TextOps.MojibakeSeqs.mkString(" "))
    val repl = docs.head.copy(doc_id = 900002L,
      ts = new Timestamp(docs.head.ts.getTime + 2000L),
      text = docs.head.text + "��")
    val dup = docs(1).copy(doc_id = 900003L,
      ts = new Timestamp(docs(1).ts.getTime + 3000L))
    val all = docs ++ Seq(moji, repl, dup)

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Doc]
    val q = StreamingDedup.cleanStream(mem.toDF(), "ts", "text", "10 minutes")
      .writeStream.format("memory").queryName("clean_out")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    val (b1, b2) = all.splitAt(all.size / 2)
    mem.addData(b1: _*)
    q.processAllAvailable()
    mem.addData(b2: _*)
    q.processAllAvailable()
    q.stop()

    val kept = spark.table("clean_out").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(!kept.contains(900001L) && !kept.contains(900002L),
      "encoding-artifact rows must not survive the gate")
    assert(!kept.contains(900003L), "exact duplicate must dedup away")

    // batch parity: same gates + exact dedup over the same rows (tuples:
    // the inner-class Doc encoder can't instantiate outside the stream)
    val batchDf = all.map(d => (d.doc_id, d.ts, d.text))
      .toDF("doc_id", "ts", "text")
    val batchKept = graft.operators.Dedup.dedupExact(
        batchDf.filter(graft.operators.TextOps.encodingArtifacts(col("text"))
          .getField("looks_clean"))
          .filter(graft.operators.TextOps.qualityScore(col("text")) >= 0.3),
        "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == batchKept,
      s"stream/batch divergence: onlyStream=${(kept -- batchKept).take(5)} " +
        s"onlyBatch=${(batchKept -- kept).take(5)}")
  }

  test("streaming bloom decontamination matches the batch tier, statelessly") {
    import spark.implicits._
    val base = graft.Tables.documents(spark, sf("sf0.001"))
      .select(col("doc_id"), col("text"))
      .collect().map(r => Doc(r.getLong(0),
        new Timestamp(1700000000000L + r.getLong(0) * 1000L), r.getString(1)))
      .toSeq
    // benchmark = the first 5 docs' texts: those corpus rows MUST drop
    val benchDf = base.take(5).map(_.text).toDF("btext")
    val bloom = graft.operators.Dedup.benchBloomWords(benchDf, "btext", n = 3)

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Doc]
    val q = StreamingDedup.decontaminateBloomStream(mem.toDF(), "text", bloom)
      .writeStream.format("memory").queryName("deconb_out")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    val (b1, b2) = base.splitAt(base.size / 2)
    mem.addData(b1: _*); q.processAllAvailable()
    mem.addData(b2: _*); q.processAllAvailable()
    q.stop()

    val kept = spark.table("deconb_out").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(base.take(5).forall(d => !kept.contains(d.doc_id)),
      "benchmark-identical docs must drop")
    val batchDf = base.map(d => (d.doc_id, d.text)).toDF("doc_id", "text")
    val batchKept = graft.operators.Dedup.decontaminateBloom(
        batchDf, "doc_id", "text", benchDf, "btext", n = 3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == batchKept,
      s"stream/batch divergence: onlyStream=${(kept -- batchKept).take(5)} " +
        s"onlyBatch=${(batchKept -- kept).take(5)}")
  }

  case class PackDoc(source: String, doc_id: Long, ts: Timestamp, tk: Long)

  test("streaming sequence packing matches the batch layout and persists offsets") {
    import spark.implicits._
    // batch input ordered by (source, doc_id): ts encodes that order so the
    // stream's (ts, id) intra-batch sort reproduces the batch layout
    val docs = graft.Tables.documents(spark, sf("sf0.001"))
      .select(col("source"), col("doc_id"),
        graft.operators.TextOps.tokenCount(col("text")).cast("long").as("tk"))
      .orderBy("source", "doc_id").collect()
      .zipWithIndex.map { case (r, i) =>
        PackDoc(r.getString(0), r.getLong(1),
          new Timestamp(1700000000000L + i * 1000L), r.getLong(2)) }.toSeq

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[PackDoc]
    val q = StreamingDedup.packSequencesStream(
        mem.toDF(), "source", "doc_id", "ts", "tk", ctx = 512L)
      .writeStream.format("memory").queryName("pack_out")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    // split MID-SOURCE so the second micro-batch must resume offsets
    val (b1, b2) = docs.splitAt(docs.size / 2 + 3)
    mem.addData(b1: _*); q.processAllAvailable()
    mem.addData(b2: _*); q.processAllAvailable()
    q.stop()

    val streamed = spark.table("pack_out")
      .select("part", "doc_id", "seq_id", "span_start", "span_len")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    val batchDf = docs.map(d => (d.source, d.doc_id, d.tk))
      .toDF("source", "doc_id", "tk")
    val batch = graft.operators.Shards
      .packSequences(batchDf, "source", "doc_id", "tk", ctx = 512L)
      .select("source", "doc_id", "seq_id", "span_start", "span_len")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(streamed == batch,
      s"layout divergence: onlyStream=${(streamed -- batch).take(5)} " +
        s"onlyBatch=${(batch -- streamed).take(5)}")
  }

  test("streaming classifier scoring matches batch z_sum under pinned weights") {
    import spark.implicits._
    // the p57 planted-marker corpus PLUS featureless docs (< 2 tokens, no
    // bigrams): batch must score them z_sum = 0 (empty-fx coalesce), the
    // exact value the stream's bigram_logit kernel returns — a NULL on the
    // batch side would silently drop them from any predicted-gated output
    val shorties = Seq((100001L, "", false), (100002L, "one", false))
      .toDF("doc_id", "text", "y")
    val docs = graft.Tables.documents(spark, sf("sf0.001"))
      .select(col("doc_id"),
        when(pmod(col("doc_id"), lit(3)) === 0,
          concat(col("text"), lit(" qz mark qz mark qz mark")))
          .otherwise(col("text")).as("text"),
        (pmod(col("doc_id"), lit(3)) === 0).as("y"))
      .unionByName(shorties)
    val w = graft.operators.Classifier.trainWeights(
      docs, "doc_id", "text", col("y"), buckets = 64, iters = 3)
    val batch = graft.operators.Classifier.trainScoreLr(
        docs, "doc_id", "text", col("y"), buckets = 64, iters = 3)
      .select("doc_id", "z_sum", "predicted")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap

    val base = docs.select("doc_id", "text").collect()
      .map(r => Doc(r.getLong(0),
        new Timestamp(1700000000000L + r.getLong(0) * 1000L), r.getString(1)))
      .toSeq
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Doc]
    val q = StreamingDedup.classifierScoreStream(
        mem.toDF(), "text", w.toSeq, minZ = Long.MinValue)
      .writeStream.format("memory").queryName("clf_out")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    mem.addData(base: _*); q.processAllAvailable()
    q.stop()

    val streamed = spark.table("clf_out").select("doc_id", "z_sum", "predicted")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(streamed.size == base.size, "stateless scorer must emit every row")
    val diverged = batch.collect {
      case (id, bz) if streamed(id)._1 != bz._1 => (id, bz, streamed(id))
    }
    assert(diverged.isEmpty, s"z divergence: ${diverged.take(5)}")
    assert(batch.forall { case (id, bz) => streamed(id)._2 == bz._2 })
    // and the default gate keeps exactly the predicted-positive docs
    val mem2 = MemoryStream[Doc]
    val q2 = StreamingDedup.classifierScoreStream(mem2.toDF(), "text", w.toSeq)
      .writeStream.format("memory").queryName("clf_kept")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    mem2.addData(base: _*); q2.processAllAvailable()
    q2.stop()
    val kept = spark.table("clf_kept").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept == batch.collect { case (id, (_, p)) if p => id }.toSet)
  }

  case class Vec(vec_id: Long, ts: Timestamp, embedding: Seq[Float])

  test("streaming embedding decontamination drops pinned-eval look-alikes") {
    import spark.implicits._
    val rows = Seq(
      Vec(10L, new Timestamp(1700000000000L), Seq(1f, 0f)),
      Vec(11L, new Timestamp(1700000001000L), Seq(0f, 1f)),
      Vec(12L, new Timestamp(1700000002000L), Seq(3f, 4f)),
      Vec(13L, new Timestamp(1700000003000L), Seq(0f, 0f))) // zero-norm keeps
    val eval = Seq(Seq(2.0, 0.0), Seq(0.0, 5.0))

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Vec]
    val q = StreamingDedup.embedDecontaminateStream(mem.toDF(), "embedding",
        eval, minSim = 0.95)
      .writeStream.format("memory").queryName("decone_out")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    mem.addData(rows: _*); q.processAllAvailable()
    q.stop()

    val kept = spark.table("decone_out")
      .select("vec_id", "max_test_sim")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(kept.keySet == Set(12L, 13L), kept) // 10/11 are eval directions
    assert(math.abs(kept(12L) - 0.8) < 1e-12)  // (3,4)/5 vs (0,1) = 0.8
    assert(kept(13L) == 0.0)
  }

  test("streaming URL dedup: surface variants of one canonical URL collapse to first arrival") {
    import spark.implicits._
    val base = 1700000000000L
    // four surface forms of ONE canonical URL arriving in id order, plus a
    // genuinely different URL in the same batch window
    val rows = Seq(
      (1L, new Timestamp(base), "https://a.io/x?id=1&utm_source=f"),
      (2L, new Timestamp(base + 1000L), "HTTPS://A.IO:443/x?id=1"),
      (3L, new Timestamp(base + 2000L), "https://user@a.io/x/?id=1#frag"),
      (4L, new Timestamp(base + 3000L), "https://a.io/x?id=1"),
      (5L, new Timestamp(base + 4000L), "https://a.io/y?id=1"),
      // URL-less rows share a surface value but must BOTH survive (they
      // bypass the dedup state on the map-only branch, like the batch twin)
      (6L, new Timestamp(base + 5000L), "N/A"),
      (7L, new Timestamp(base + 6000L), "N/A"))
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String)]
    val q = StreamingDedup.dedupByUrlStream(
        mem.toDF().toDF("doc_id", "ts", "url"), "ts", "url", "10 minutes")
      .writeStream.format("memory").queryName("url_dedup_out")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    mem.addData(rows.take(3): _*)
    q.processAllAvailable()
    mem.addData(rows.drop(3): _*) // dup across batches + the distinct URL
    q.processAllAvailable()
    q.stop()
    val kept = spark.table("url_dedup_out").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 5L, 6L, 7L), s"kept $kept")
    // parity with the batch operator on the same rows
    val batchKept = graft.operators.Urls
      .dedupByUrl(rows.toDF("doc_id", "ts", "url"), "doc_id", "url")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(batchKept == kept)
  }

  test("streaming near-dedup: later near-dups dropped, collision-free originals kept") {
    import spark.implicits._
    import graft.operators.Dedup

    val base = 1700000000000L
    val docsDf = graft.Tables.documents(spark, sf("sf0.001"))
      .select(col("doc_id"), col("text"))
    val originals = docsDf.collect()
      .map(r => Doc(r.getLong(0), new Timestamp(base), r.getString(1)))
      .sortBy(_.doc_id).toSeq
    // near-dups of the first 10 docs: last two words dropped, later arrival
    val dups = originals.take(10).map { d =>
      val words = d.text.split(" ")
      Doc(d.doc_id + 100000L, new Timestamp(base + 5000L),
        words.dropRight(2).mkString(" "))
    }

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Doc]
    val q = StreamingDedup.dedupNearStream(mem.toDF(), "ts", "doc_id", "text",
      watermark = "10 seconds", windowDur = "10 seconds")
      .writeStream.format("memory").queryName("neardedup_out")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    mem.addData(originals: _*)
    q.processAllAvailable()
    mem.addData(dups: _*)
    q.processAllAvailable()
    // sentinel far past the watermark + window flushes the append-mode agg
    mem.addData(Doc(999999L, new Timestamp(base + 120000L), "flush flush flush now"))
    q.processAllAvailable()
    mem.addData(Doc(999998L, new Timestamp(base + 180000L), "flush again and again"))
    q.processAllAvailable()
    q.stop()

    val kept = spark.table("neardedup_out")
      .select("doc_id").collect().map(_.getLong(0)).toSet

    // order-robust batch ground truth: a batch-1 doc whose 16 band keys
    // collide with NO other batch-1 doc is kept regardless of intra-batch
    // claim races
    val sets = Dedup.shingleSets(docsDf, "doc_id", "text", 3)
    val bandRows = sets
      .select(col("id"), posexplode(
        Dedup.bandKeys(Dedup.rowMinhashSig(col("shingles"), 64), 64, 16)))
      .toDF("id", "band", "bh")
    val contended = bandRows.groupBy("band", "bh")
      .agg(count(lit(1)).as("n")).filter(col("n") > 1)
    val collidingIds = bandRows.join(contended, Seq("band", "bh"))
      .select("id").distinct().collect().map(_.getLong(0)).toSet
    val eligible = sets.select("id").collect().map(_.getLong(0)).toSet
    val collisionFree = eligible -- collidingIds

    assert(collisionFree.subsetOf(kept),
      s"${(collisionFree -- kept).size} collision-free originals missing")
    // every injected near-dup shares >= 1 band with its original -> dropped
    val dupIds = dups.map(_.doc_id).toSet
    assert(kept.intersect(dupIds).isEmpty, s"near-dups kept: ${kept.intersect(dupIds)}")
    // no phantom ids beyond batch-1 docs and the (novel) sentinel flushers
    assert((kept -- Set(999999L, 999998L)).subsetOf(eligible))
  }

  test("streaming paragraph dedup: first arrival claims, docs rebuilt in order") {
    import spark.implicits._
    val base = 1700000000000L
    // docs fed ONE PER BATCH so arrival order is strict (within one batch,
    // which duplicate wins dropDuplicatesWithinWatermark is undefined)
    val docs = Seq(
      Doc(1L, new Timestamp(base), "alpha\nbeta\ngamma"),
      Doc(2L, new Timestamp(base + 1000), "beta\ndelta"),
      Doc(3L, new Timestamp(base + 2000), "alpha\nbeta"),   // nothing survives
      Doc(4L, new Timestamp(base + 3000), "gamma\nepsilon\nalpha"))

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Doc]
    val q = StreamingDedup.dedupParagraphsStream(mem.toDF(), "ts", "doc_id",
      "text", watermark = "10 seconds", windowDur = "10 seconds")
      .writeStream.format("memory").queryName("paradedup_out")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    docs.foreach { d => mem.addData(d); q.processAllAvailable() }
    mem.addData(Doc(99L, new Timestamp(base + 120000), "flush"))
    q.processAllAvailable()
    mem.addData(Doc(98L, new Timestamp(base + 180000), "flush2"))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("paradedup_out")
      .filter(col("doc_id") < 90)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("text_kept"), r.getAs[Long]("n_kept"))).toMap
    // matches the batch operator's first-occurrence policy (arrival = id order here)
    assert(out(1L) == (("alpha\nbeta\ngamma", 3L)), out.toString)
    assert(out(2L) == (("delta", 1L)), out.toString)
    assert(!out.contains(3L), "fully-deduplicated doc must be absent")
    assert(out(4L) == (("epsilon", 1L)), out.toString)
  }

  /** Shared parity harness: run `op` (either verified tier — identical
    * policy) over the corpus + injected near-dups, compare the kept set
    * against a sequential replay of the first-claim/exact-verify policy. */
  private def verifiedParity(
      queryName: String,
      op: (org.apache.spark.sql.DataFrame) => org.apache.spark.sql.DataFrame): Unit = {
    import spark.implicits._
    import graft.operators.Dedup

    val base = 1700000000000L
    val docsDf = graft.Tables.documents(spark, sf("sf0.001"))
      .select(col("doc_id"), col("text"))
    val originals = docsDf.collect()
      .map(r => Doc(r.getLong(0), new Timestamp(base), r.getString(1)))
      .sortBy(_.doc_id).toSeq
    val dups = originals.take(10).map { d =>
      val words = d.text.split(" ")
      Doc(d.doc_id + 100000L, new Timestamp(base + 5000L),
        words.dropRight(2).mkString(" "))
    }
    val fed = originals ++ dups

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Doc]
    val outDf = op(mem.toDF())
    // the verified tiers scope their checkCorrectness disable to a private
    // session clone — the caller's session must keep the static check
    assert(outDf.sparkSession ne spark, "verified tier must not run in the caller's session")
    assert(spark.conf.get(
      "spark.sql.streaming.statefulOperator.checkCorrectness.enabled", "true") == "true",
      "caller session lost the stateful-operator correctness check")
    val q = outDf
      .writeStream.format("memory").queryName(queryName)
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    mem.addData(originals: _*)
    q.processAllAvailable()
    mem.addData(dups: _*)
    q.processAllAvailable()
    mem.addData(Doc(999999L, new Timestamp(base + 120000L), "flush flush flush now"))
    q.processAllAvailable()
    mem.addData(Doc(999998L, new Timestamp(base + 180000L), "flush again and again"))
    q.processAllAvailable()
    q.stop()
    // the memory sink registers in the clone, not the outer session
    val kept = outDf.sparkSession.table(queryName)
      .select("doc_id").collect().map(_.getLong(0)).toSet -- Set(999999L, 999998L)

    // ground truth: sequential replay of the exact policy over (ts, id)
    // order — first arrival owns each bucket; later arrivals drop iff
    // true jaccard vs the owner >= 0.5 in any bucket
    val fedDf = fed.map(d => (d.doc_id, d.text)).toDF("doc_id", "text")
    val infos = Dedup.shingleSets(fedDf, "doc_id", "text", 3)
      .withColumn("fps", transform(col("shingles"), c => Dedup.mdHash31(c).cast("int")))
      .withColumn("keys", Dedup.bandKeys(Dedup.rowMinhashSig(col("shingles"), 64), 64, 16))
      .select("id", "fps", "keys").collect()
      .map(r => (r.getLong(0),
        r.getSeq[Int](1).toSet,
        r.getSeq[String](2).zipWithIndex.map { case (bh, b) => (b, bh) }))
    val tsOf = fed.map(d => d.doc_id -> d.ts.getTime).toMap
    val owners = scala.collection.mutable.Map[(Int, String), (Long, Set[Int])]()
    val dropped = scala.collection.mutable.Set[Long]()
    infos.sortBy { case (id, _, _) => (tsOf(id), id) }.foreach { case (id, fps, keys) =>
      val isDup = keys.exists { k =>
        owners.get(k).exists { case (oid, ofps) =>
          val inter = fps.intersect(ofps).size.toDouble
          oid != id && inter / (fps.size + ofps.size - inter) >= 0.5
        }
      }
      if (isDup) dropped += id
      keys.foreach(k => if (!owners.contains(k)) owners(k) = (id, fps))
    }
    val eligible = infos.map(_._1).toSet
    val expectedKept = eligible -- dropped

    assert(kept == expectedKept,
      s"missing=${(expectedKept -- kept).take(5)} extra=${(kept -- expectedKept).take(5)}")
    // the verify tier's reason to exist: band-colliding NON-duplicates
    // survive (the collision-only tier would have dropped them)
    val bandRows2 = Dedup.shingleSets(docsDf, "doc_id", "text", 3)
      .select(col("id"), posexplode(
        Dedup.bandKeys(Dedup.rowMinhashSig(col("shingles"), 64), 64, 16)))
      .toDF("id", "band", "bh")
    val contended2 = bandRows2.groupBy("band", "bh")
      .agg(count(lit(1)).as("nc")).filter(col("nc") > 1)
    val collidingOriginals = bandRows2.join(contended2, Seq("band", "bh"))
      .select("id").distinct().collect().map(_.getLong(0)).toSet
    val falseCollisions = collidingOriginals.intersect(expectedKept)
    assert(falseCollisions.nonEmpty, "fixture lost its band-colliding non-dups")
    assert(falseCollisions.subsetOf(kept))
  }

  test("verified streaming near-dedup: exact parity with a sequential replay (precision 1)") {
    implicit val s = spark
    verifiedParity("verified_out",
      df => StreamingDedup.dedupNearStreamVerified(df, "ts", "doc_id", "text",
        watermarkDelayMs = 10000L, windowDur = "10 seconds"))
  }

  test("staged verified tier: same policy, fingerprints attached only to colliders") {
    implicit val s = spark
    verifiedParity("verified_staged_out",
      df => StreamingDedup.dedupNearStreamVerifiedStaged(df, "ts", "doc_id",
        "text", watermarkDelayMs = 10000L, windowDur = "10 seconds"))
  }
}
