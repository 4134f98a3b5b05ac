package graft.operators

import graft.SparkSpecBase
import graft.testkit.TaskStats
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Adversarial-skew soak: the dedup skew guards (`maxDocFreq`, `maxBucket`)
  * and the components hub handling, FIRED UNDER MEASUREMENT instead of
  * design-argued. The corpus plants the two classic hot keys of web-scale
  * dedup:
  *
  *  - a STOP-SHINGLE present in 80% of documents (a shared footer phrase):
  *    its inverted-index posting list alone yields ~(0.8n)²/2 candidate
  *    pairs, all landing on the ONE reduce task that owns the shingle key;
  *  - a BOILERPLATE CLUSTER of identical documents (a terms-of-service
  *    page): identical MinHash signatures collide in EVERY band, so one LSH
  *    bucket yields m²/2 candidates × bands.
  *
  * Both skews scale QUADRATICALLY in corpus size while real pairs scale
  * linearly — at 100 TB the uncapped shapes are not slow, they are
  * non-terminating (a 1M-doc boilerplate cluster is 5·10^11 candidate pairs
  * on one task). The soak proves, at a size where the uncapped run still
  * finishes, that the caps remove exactly the quadratic term and keep every
  * true near-dup pair; and at an sf1-scale tier that the capped pipelines
  * have bounded per-task load.
  *
  * Assertions key on per-task SHUFFLE RECORD counts (deterministic); wall /
  * max-task times are printed and recorded in COVERAGE.md (environment-
  * dependent). Groups of `groupSize` identical-template documents provide
  * the true near-dup signal that must SURVIVE capping (cap >> group size).
  */
class SkewSoakSpec extends SparkSpecBase {

  /** Measured runs disable broadcast joins: at this toy size AQE broadcasts
    * the (few-MB) postings side, which spreads the quadratic join output
    * across stream partitions — a shape that CANNOT occur at 100 TB, where
    * postings are petabyte-order and every pair join is shuffle-partitioned
    * by key (the hot key's entire output then lands on ONE reduce task).
    * Forcing the shuffled join reproduces the at-scale plan at soak size. */
  private def atScalePlans[A](body: => A): A = {
    val keys = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    keys.foreach(k => spark.conf.set(k, "-1"))
    try body
    finally saved.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
  }

  /** Deterministic skew corpus:
    *  - `nNormal` docs in `nNormal/groupSize` groups; members of a group
    *    share the same 10 unique body tokens (near-dup signal, doc freq =
    *    groupSize per body shingle);
    *  - 80% of normal docs (id % 5 != 0) carry the hot footer trigram;
    *  - `nBoiler` docs with byte-identical boilerplate text. */
  private def soakCorpus(nNormal: Long, groupSize: Long, nBoiler: Long): DataFrame = {
    val nGroups = nNormal / groupSize
    val normal = spark.range(nNormal).select(col("id"),
      concat(
        concat_ws(" ", (0 until 10).map(j =>
          concat(lit("g"), pmod(col("id"), lit(nGroups)), lit(s"w$j"))): _*),
        when(pmod(col("id"), lit(5)) =!= 0, lit(" zzhot1 zzhot2 zzhot3"))
          .otherwise(lit(""))).as("text"))
    val boiler = spark.range(nBoiler).select((col("id") + nNormal).as("id"),
      lit("terms of service apply to all users of this web site every day").as("text"))
    normal.unionAll(boiler)
  }

  // straggler tier: small enough that the UNCAPPED quadratic run still
  // terminates, big enough that its hot task visibly dominates
  private val N_NORMAL = 2000L
  private val GROUP = 4L
  private val N_BOILER = 500L
  private val N_HOT = (0L until N_NORMAL).count(_ % 5 != 0)  // 1600

  test("jaccard: doc-frequency cap removes the stop-shingle straggler, keeps all true pairs") {
    val docs = soakCorpus(N_NORMAL, GROUP, N_BOILER)

    val ((uncappedPairs, up), (cappedPairs, cp)) = atScalePlans {
      (TaskStats.profile(spark) {
        val df = Dedup.jaccardPairs(docs, "id", "text", n = 3, minJaccard = 0.5)
        val n = df.count(); (df, n)
      },
      TaskStats.profile(spark) {
        val df = Dedup.jaccardPairs(docs, "id", "text", n = 3, minJaccard = 0.5,
          maxDocFreq = Some(50))
        val n = df.count(); (df, n)
      })
    }
    info(up.summary("jaccard uncapped"))
    info(cp.summary("jaccard capped(df<=50)"))

    // result contract: the cap drops ONLY hyper-common content. True
    // near-dup pairs = 6 per group (all members pairwise >= 0.5 whether or
    // not they carry the footer); boilerplate pairs = C(500,2) are
    // exact-dedup territory and exactly what the cap removes.
    val nGroups = (N_NORMAL / GROUP).toInt
    assert(cappedPairs._2 == 6L * nGroups, s"capped pairs = ${cappedPairs._2}")
    assert(uncappedPairs._2 == 6L * nGroups + N_BOILER * (N_BOILER - 1) / 2,
      s"uncapped pairs = ${uncappedPairs._2}")

    // skew contract: the uncapped hot task materializes >= C(1600,2) pair
    // rows from the stop-shingle posting alone; every capped task stays
    // bounded by cap² per shingle
    val hotPairRows = N_HOT * (N_HOT - 1) / 2  // 1,279,200
    assert(up.maxSwRecords >= hotPairRows,
      s"expected the uncapped straggler task to write >= $hotPairRows, saw ${up.maxSwRecords}")
    assert(cp.maxSwRecords * 8 < up.maxSwRecords,
      s"cap should shrink the max task >8x: capped=${cp.maxSwRecords} uncapped=${up.maxSwRecords}")
  }

  test("minhash LSH: bucket cap removes the boilerplate straggler, keeps group pairs") {
    val docs = soakCorpus(N_NORMAL, GROUP, N_BOILER)

    val ((unc, up), (cap, cp)) = atScalePlans {
      (TaskStats.profile(spark) {
        val df = Dedup.minhashLshPairs(docs, "id", "text", n = 3, minJaccard = 0.5)
        val n = df.count(); (df, n)
      },
      TaskStats.profile(spark) {
        val df = Dedup.minhashLshPairs(docs, "id", "text", n = 3, minJaccard = 0.5,
          maxBucket = Some(50))
        val n = df.count(); (df, n)
      })
    }
    info(up.summary("minhash uncapped"))
    info(cp.summary("minhash capped(bkt<=50)"))

    val nGroups = (N_NORMAL / GROUP).toInt
    val boilerPairs = N_BOILER * (N_BOILER - 1) / 2  // 124,750
    // identical docs always collide (equal signatures): every same-footer
    // in-group pair and every boilerplate pair is guaranteed in the
    // uncapped output; mixed-footer pairs (sim 0.727) follow the LSH curve
    // (>= 99% at these parameters) — bounds, not exact counts
    assert(unc._2 >= boilerPairs + 3L * nGroups && unc._2 <= 6L * nGroups + boilerPairs,
      s"uncapped pairs = ${unc._2}")
    // the cap drops ONLY boilerplate buckets (group buckets are size <= 4)
    assert(cap._2 == unc._2 - boilerPairs, s"capped pairs = ${cap._2}, uncapped = ${unc._2}")

    // the uncapped bucket join emits C(500,2) candidates for EACH of the 16
    // bands' boiler buckets (~2M rows over 16 bucket keys); the in-stage
    // partial distinct combines the per-band copies, so the straggler task
    // still WRITES the entire clique pair set (>= C(500,2) records) after
    // doing 16x that in join work; capped tasks never see a bucket over 50
    assert(up.maxSwRecords >= boilerPairs,
      s"expected a straggler writing >= $boilerPairs pair rows, saw ${up.maxSwRecords}")
    assert(cp.maxSwRecords * 5 < up.maxSwRecords,
      s"cap should shrink the max task >5x: capped=${cp.maxSwRecords} uncapped=${up.maxSwRecords}")
  }

  test("cosine LSH: bucket cap removes the identical-embedding straggler") {
    // 2000 deterministic 16-dim vectors (distinct directions) + a cluster
    // of 500 byte-identical embeddings — the vector-side boilerplate: an
    // identical cluster collides in EVERY table, m²/2 candidates per table
    val normal = spark.range(2000L).select(col("id"),
      transform(sequence(lit(0), lit(15)),
        j => cos(col("id") * 31 + j.cast("double"))).as("emb"))
    val boiler = spark.range(500L).select((col("id") + 10000L).as("id"),
      transform(sequence(lit(0), lit(15)),
        j => (j.cast("double") + 1.0) / 16.0).as("emb"))
    val vecs = normal.unionAll(boiler)
    val boilerPairs = 500L * 499L / 2  // 124,750

    val ((unc, up), (cap, cp)) = atScalePlans {
      (TaskStats.profile(spark) {
        val df = Similarity.cosineNearDupLsh(vecs, "id", "emb", minSim = 0.95)
        val n = df.count(); (df, n)
      },
      TaskStats.profile(spark) {
        val df = Similarity.cosineNearDupLsh(vecs, "id", "emb", minSim = 0.95,
          maxBucket = Some(50L))
        val n = df.count(); (df, n)
      })
    }
    info(up.summary("cosLSH uncapped"))
    info(cp.summary("cosLSH capped(bkt<=50)"))

    // clone-pair accounting is exact whatever the ordinary vectors do:
    // every identical pair collides (sim = 1), and the cap removes all of
    // them (their buckets are 500-deep in every table)
    def clonePairs(df: org.apache.spark.sql.DataFrame): Long =
      df.filter(col("id_a") >= 10000L && col("id_b") >= 10000L).count()
    assert(clonePairs(unc._1) == boilerPairs, s"uncapped clone pairs != $boilerPairs")
    assert(clonePairs(cap._1) == 0L, "capped run must drop the whole clone cluster")

    // the uncapped bucket join materializes the clique's pair set in one
    // task (partial distinct combines the per-table copies, as in minhash)
    assert(up.maxSwRecords >= boilerPairs,
      s"expected a straggler writing >= $boilerPairs pair rows, saw ${up.maxSwRecords}")
    assert(cp.maxSwRecords * 5 < up.maxSwRecords,
      s"cap should shrink the max task >5x: capped=${cp.maxSwRecords} uncapped=${up.maxSwRecords}")
  }

  test("semdedup: the cell cap removes the identical-embedding cell straggler") {
    // vector-side boilerplate, SemDeDup edition: 500 byte-identical
    // embeddings always co-cell, so the within-cell join owes C(500,2)
    // pair rows from ONE reduce task; maxCell drops the cell whole. The
    // pairs route through a distinct (what any consumer's next shuffle
    // does) so the straggler's output volume lands in shuffle-write
    // records, the deterministic metric the other soaks assert on.
    val normal = spark.range(2000L).select(col("id"),
      transform(sequence(lit(0), lit(15)),
        j => cos(col("id") * 31 + j.cast("double"))).as("emb"))
    val boiler = spark.range(500L).select((col("id") + 10000L).as("id"),
      transform(sequence(lit(0), lit(15)),
        j => (j.cast("double") + 1.0) / 16.0).as("emb"))
    val vecs = normal.unionAll(boiler)
    val boilerPairs = 500L * 499L / 2  // 124,750

    val ((unc, up), (cap, cp)) = atScalePlans {
      (TaskStats.profile(spark) {
        val df = Similarity.semDedupPairs(vecs, "id", "emb",
          minSim = 0.95, nCentroids = 16)
        val n = df.select("id_a", "id_b").distinct().count(); (df, n)
      },
      TaskStats.profile(spark) {
        val df = Similarity.semDedupPairs(vecs, "id", "emb",
          minSim = 0.95, nCentroids = 16, maxCell = Some(50L))
        val n = df.select("id_a", "id_b").distinct().count(); (df, n)
      })
    }
    info(up.summary("semdedup uncapped"))
    info(cp.summary("semdedup capped(cell<=50)"))

    // clone-pair accounting is exact: identical vectors share a cell and
    // have sim 1, so every clone pair appears uncapped and none capped
    def clonePairs(df: org.apache.spark.sql.DataFrame): Long =
      df.filter(col("id_a") >= 10000L && col("id_b") >= 10000L).count()
    assert(clonePairs(unc._1) == boilerPairs, "uncapped must emit the whole clone clique")
    assert(clonePairs(cap._1) == 0L, "capped must drop the 500-deep cell whole")

    // the uncapped clone cell's task writes the entire clique pair set;
    // capped tasks never see a cell over 50
    assert(up.maxSwRecords >= boilerPairs,
      s"expected a straggler writing >= $boilerPairs pair rows, saw ${up.maxSwRecords}")
    assert(cp.maxSwRecords * 5 < up.maxSwRecords,
      s"cap should shrink the max task >5x: capped=${cp.maxSwRecords} uncapped=${up.maxSwRecords}")
  }

  test("substring dedup: a 500-deep boilerplate gram stays LINEAR (no pair join to cap)") {
    // the substring tier has NO cap parameter because it has no quadratic
    // shape to guard: the hot gram's postings meet a single winner row
    // (partial-agg min), never each other. This soak proves the linearity
    // the design argues — the same 500-identical-doc clique that forces
    // caps onto jaccard/minhash/cosine (C(500,2) ≈ 125k pair rows on one
    // task) flows through here at ~500 rows per gram value.
    val nNormal = 2000L
    val boilerText = "terms of service apply to all users of this site every day"
    val normal = spark.range(nNormal).select(col("id"),
      concat_ws(" ", (0 until 12).map(j =>
        concat(lit("d"), col("id"), lit(s"w$j"))): _*).as("text"))
    val boiler = spark.range(500L).select((col("id") + nNormal).as("id"),
      lit(boilerText).as("text"))
    val docs = normal.unionAll(boiler)
    // 12 tokens/doc, k=8 -> 5 grams/doc
    val totalPostings = (nNormal + 500L) * 5L

    val ((out, stats)) = atScalePlans {
      TaskStats.profile(spark) {
        val df = Dedup.dedupSubstrings(docs, "id", "text", k = 8)
        df.persist(); df.count(); df
      }
    }
    info(stats.summary("substring dedup (500-deep hot gram)"))

    // correctness: first boiler doc survives whole, every other copy is
    // fully cut; normal docs (globally unique grams) are untouched
    val boilerOut = out.filter(col("id") >= nNormal)
      .select("id", "n_kept", "n_cut").collect()
    assert(boilerOut.length == 500)
    boilerOut.foreach { r =>
      if (r.getLong(0) == nNormal) assert(r.getLong(1) == 12L && r.getLong(2) == 0L)
      else assert(r.getLong(1) == 0L && r.getLong(2) == 12L, r.toString)
    }
    assert(out.filter(col("id") < nNormal && col("n_cut") =!= 0L).count() == 0L)
    out.unpersist()

    // scale: every task's shuffle write stays bounded by the LINEAR posting
    // volume — nothing anywhere near the C(500,2)x5 a pair join would emit
    assert(stats.maxSwRecords <= totalPostings,
      s"hot-gram task must stay linear: maxSwRecords=${stats.maxSwRecords} > $totalPostings")
  }

  test("connected components absorb a 50k-edge hub and a 20k-node path") {
    import spark.implicits._
    // adversarial graph: one celebrity node (degree 50k — the giant
    // boilerplate cluster's star) plus a 20k-node path (worst case for
    // label propagation, O(log n) here)
    val hub = spark.range(1, 50001).select(lit(0L).as("a"), col("id").as("b"))
    val path = spark.range(60000, 80000).select(col("id").as("a"), (col("id") + 1).as("b"))
    val edges = hub.unionAll(path)

    // the loop runs eagerly inside connectedComponents (per-round
    // materialize + convergence check), so the profile captures it all
    val (cc, p) = atScalePlans {
      TaskStats.profile(spark) {
        Components.connectedComponents(edges, "a", "b")
      }
    }
    info(p.summary("components hub+path"))

    val byComp = cc.groupBy("component").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byComp == Map(0L -> 50001L, 60000L -> 20001L), byComp.toString)
    // per-node min is a partial agg: no task ever shuffles the hub's whole
    // neighborhood as one record group beyond the join fan-out (bounded by
    // degree, never degree²)
    assert(p.maxSwRecords < 120000L,
      s"components task wrote ${p.maxSwRecords} records — expected < 2.4x the hub degree")
  }

  test("sf1-scale tier: capped pipelines stay bounded at 44k docs (40% hot, 4k boilerplate)") {
    // sf1-sized documents table is ~50k docs; uncapped at this size is the
    // non-terminating shape (32k-doc stop-shingle = 5·10^8 pairs, 4k-doc
    // boilerplate bucket = 8M candidates/band) — by construction only the
    // CAPPED pipelines run here, and the straggler tier above is the
    // measured evidence for what the caps remove.
    val docs = soakCorpus(40000L, 4L, 4000L).cache()
    try atScalePlans {
      val nGroups = 10000

      val (jn, jp) = TaskStats.profile(spark) {
        Dedup.jaccardPairs(docs, "id", "text", n = 3, minJaccard = 0.5,
          maxDocFreq = Some(100)).count()
      }
      info(jp.summary("sf1 jaccard capped"))
      assert(jn == 6L * nGroups, s"jaccard pairs = $jn")

      val (mn, mp) = TaskStats.profile(spark) {
        Dedup.minhashLshPairs(docs, "id", "text", n = 3, minJaccard = 0.5,
          maxBucket = Some(100)).count()
      }
      info(mp.summary("sf1 minhash capped"))
      assert(mn >= 3L * nGroups && mn <= 6L * nGroups, s"minhash pairs = $mn")

      val (cl, clp) = TaskStats.profile(spark) {
        val pairs = Dedup.minhashLshPairs(docs, "id", "text", n = 3,
          minJaccard = 0.5, maxBucket = Some(100))
        Components.dedupClusters(docs, "id", pairs)
          .groupBy("cluster_size").count().collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
      }
      info(clp.summary("sf1 dedup clusters"))
      // every template group comes back as one size-4 cluster (10000 x 4
      // docs); the 4k boilerplate docs are capped out of pair generation,
      // so they are singletons here (exact dedup handles them — that is
      // the contract). Map is cluster_size -> docs at that size.
      assert(cl == Map(4L -> 40000L, 1L -> 4000L), s"cluster sizes: $cl")

      // substring dedup runs UNCAPPED at this size — it has no quadratic
      // term: the 4k-deep boilerplate grams and the 4-deep group-body
      // grams meet a partial-agg winner, never each other. Exact survivor
      // accounting: a doc is fully intact iff it is globally first for all
      // its grams = each group's min id (bodies are group-unique) plus the
      // first boilerplate doc.
      val ((intact, boilerKept), sp) = TaskStats.profile(spark) {
        val out = Dedup.dedupSubstrings(docs, "id", "text", k = 8)
        out.persist()
        val n0 = out.filter(col("n_cut") === 0L).count()
        val nb = out.filter(col("id") >= 40000L && col("n_kept") > 0L).count()
        out.unpersist()
        (n0, nb)
      }
      info(sp.summary("sf1 substring dedup (uncapped — linear by shape)"))
      assert(intact == nGroups + 1L, s"intact docs = $intact")
      assert(boilerKept == 1L, s"boiler survivors = $boilerKept")

      // bounded per-task load across all four pipelines: nothing within an
      // order of magnitude of the quadratic terms (5·10^8 / 8M)
      for ((label, prof) <- Seq(("jaccard", jp), ("minhash", mp),
          ("clusters", clp), ("substring", sp)))
        assert(prof.maxSwRecords < 2000000L,
          s"$label max task wrote ${prof.maxSwRecords} records")
    } finally { docs.unpersist(); () }
  }
}
