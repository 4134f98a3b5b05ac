package graft.functions

import graft.SparkSpecBase
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Bloom sketch + membership: the no-false-negative guarantee, merge
  * determinism (map-side combinability), measured FP rate, and the
  * decontamination operator's superset contract vs the exact tier. */
class BloomSketchSpec extends SparkSpecBase {
  import spark.implicits._

  private val Bits = 1 << 17
  private val K = 5

  private def bloomOf(fps: Seq[Long], parts: Int): Seq[Long] =
    fps.toDF("fp").repartition(parts)
      .agg(call_function("bloom_sketch", col("fp"), lit(Bits), lit(K)).as("b"))
      .head().getSeq[Long](0)

  test("no false negatives: every inserted fingerprint probes true") {
    val fps = (0L until 5000L).map(i => i * 2654435761L)
    val bloom = bloomOf(fps, 4)
    val misses = fps.toDF("fp")
      .filter(!call_function("bloom_contains", typedLit(bloom), col("fp"), lit(K)))
      .count()
    assert(misses == 0L, s"$misses inserted fingerprints probed false")
  }

  test("merge is order/partitioning-independent: 1-partition and 8-partition blooms are byte-equal") {
    val fps = (0L until 5000L).map(i => i * 2654435761L)
    assert(bloomOf(fps, 1) == bloomOf(fps, 8))
  }

  test("false-positive rate stays near theory on disjoint probes") {
    val inserted = (0L until 5000L).map(i => i * 2654435761L)
    val bloom = bloomOf(inserted, 4)
    // disjoint probe set (odd offsets cannot collide with the even multiples)
    val probes = (0L until 5000L).map(i => i * 2654435761L + 1L)
    val fp = probes.toDF("fp")
      .filter(call_function("bloom_contains", typedLit(bloom), col("fp"), lit(K)))
      .count()
    // theory: (1 - e^(-K*n/m))^K ~ 1.6e-4 at n=5000, m=2^17, K=5;
    // bound generously at 1%
    assert(fp < 50L, s"FP count $fp out of 5000 probes (expected ~1)")
  }

  test("bloom decontamination: superset of the exact tier, exact hits all flagged") {
    val docs = graft.Tables.documents(spark, sf("sf0.001"))
    val corpus = docs.filter(col("doc_id") >= 5)
    val bench = docs.filter(col("doc_id") < 5)
    val exact = Dedup.contaminationHits(corpus, "doc_id", "text", bench, "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bloom = Dedup.contaminationHitsBloom(corpus, "doc_id", "text", bench, "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(exact.keySet.subsetOf(bloom.keySet),
      s"missing exact hits: ${(exact.keySet -- bloom.keySet).take(5)}")
    // per-doc shared-shingle counts can only grow under false positives
    exact.foreach { case (id, n) => assert(bloom(id) >= n, s"doc $id: ${bloom(id)} < $n") }
    // at 2^20 bits for a ~200-shingle benchmark the FP term is ~0: expect
    // no (or almost no) extra flagged docs
    val extras = bloom.keySet -- exact.keySet
    val corpusSize = corpus.count()
    assert(extras.size <= corpusSize / 20, s"${extras.size} extra flagged docs of $corpusSize")
  }

  test("bloom probe plan: one-row filter broadcasts, corpus side shuffles only for the hit count") {
    val docs = graft.Tables.documents(spark, sf("sf0.001"))
    val df = Dedup.contaminationHitsBloom(
      docs.filter(col("doc_id") >= 5), "doc_id", "text",
      docs.filter(col("doc_id") < 5), "text")
    val p = df.queryExecution.executedPlan.toString
    // the single-row bloom reaches every task via broadcast (a one-row
    // nested-loop broadcast is O(1) per task at any corpus size) and the
    // membership probe runs in the scan-side stage: the only corpus-side
    // hash exchange is the per-doc hit count after the filter
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      p.take(2000))
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 1, p.take(2000))
    assert(p.contains("bloom_contains"), "probe must be the native expression")
  }

  test("decontaminateBloom survivors = corpus minus flagged") {
    val docs = graft.Tables.documents(spark, sf("sf0.001"))
    val corpus = docs.filter(col("doc_id") >= 5)
    val flagged = Dedup.contaminationHitsBloom(corpus, "doc_id", "text",
      docs.filter(col("doc_id") < 5), "text")
      .collect().map(_.getLong(0)).toSet
    val kept = Dedup.decontaminateBloom(corpus, "doc_id", "text",
      docs.filter(col("doc_id") < 5), "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val all = corpus.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == all -- flagged)
  }

  test("a saturated tiny filter still has no false negatives") {
    val fps = (0L until 1000L).map(i => i * 7919L)
    val tiny = fps.toDF("fp")
      .agg(call_function("bloom_sketch", col("fp"), lit(64), lit(3)).as("b"))
      .head().getSeq[Long](0)
    val misses = fps.toDF("fp")
      .filter(!call_function("bloom_contains", typedLit(tiny), col("fp"), lit(3)))
      .count()
    assert(misses == 0L)
  }
}
