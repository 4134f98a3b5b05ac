package graft.functions

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** arg_max_last / top_cells vs the struct-expression forms they replaced
  * (`array_max(array(struct(sim, cid)...)).cid` and
  * `reverse(array_sort(structs))` sliced) — the semantics every IVF /
  * SemDeDup cell assignment and probe order rides on. Parity must hold on
  * the real embedding corpus AND on crafted tie / -0.0 / NaN edges, or the
  * similarity-family oracle hashes drift. */
class CellKernelSpec extends SparkSpecBase {
  import spark.implicits._

  private def structSims(v: org.apache.spark.sql.Column,
                         cents: Seq[Seq[Double]]): org.apache.spark.sql.Column =
    array(cents.zipWithIndex.map { case (c, i) =>
      struct(call_function("vec_dot", v, typedLit(c)).as("sim"),
        lit(i).as("cid"))
    }: _*)

  test("kernels match the struct forms on the embedding corpus") {
    val e = graft.Tables.embeddings(spark, sf("sf0.001"))
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    // centroids: first 16 vectors (values don't matter — parity does)
    val cents = e.orderBy("vec_id").limit(16)
      .collect().map(_.getSeq[Double](1).toSeq).toSeq
    val sims = call_function("mat_vec", typedLit(cents), col("v"))
    for (n <- Seq(1, 4, 16, 20)) {
      val diff = e.select(
          call_function("arg_max_last", sims).as("ka"),
          array_max(structSims(col("v"), cents)).getField("cid").as("sa"),
          call_function("top_cells", sims, lit(n)).as("kt"),
          transform(slice(reverse(array_sort(structSims(col("v"), cents))),
            1, n), p => p.getField("cid")).as("st"))
        .filter(!(col("ka") <=> col("sa")) || !(col("kt") <=> col("st")))
        .count()
      assert(diff == 0L, s"n=$n: $diff rows diverge from the struct forms")
    }
  }

  test("tie, -0.0 and NaN edges match Spark's struct ordering") {
    val rows = Seq(
      Seq(1.0, 3.0, 3.0, 2.0),          // tie -> higher cid
      Seq(-0.0, 0.0, -1.0),             // -0.0 == 0.0 -> higher cid wins
      Seq(0.0, -0.0),                   // reverse order of the same tie
      Seq(Double.NaN, 5.0),             // NaN greatest
      Seq(5.0, Double.NaN, Double.NaN), // NaN tie -> higher cid
      Seq(2.0),
      Seq(-1.0, -1.0, -1.0, -1.0))
    def structsOf(n: Int) = array((0 until n).map(i =>
      struct(element_at(col("s"), i + 1).as("sim"), lit(i).as("cid"))): _*)
    for (r <- rows; n <- Seq(1, 2, r.size, r.size + 3)) {
      val out = Seq(r).toDF("s").select(
          call_function("arg_max_last", col("s")).as("ka"),
          array_max(structsOf(r.size)).getField("cid").as("sa"),
          call_function("top_cells", col("s"), lit(n)).as("kt"),
          transform(slice(reverse(array_sort(structsOf(r.size))), 1, n),
            p => p.getField("cid")).as("st"))
        .head()
      assert(out.getInt(0) == out.getInt(1), s"argmax row=$r: $out")
      assert(out.getSeq[Int](2) == out.getSeq[Int](3), s"top($n) row=$r: $out")
    }
  }
}
