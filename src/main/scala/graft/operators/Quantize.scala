package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding quantization for ANN at scale: symmetric per-vector int8 —
  * scale = max|v|/127, codes = floor(v/scale + 0.5) clamped to [-127, 127].
  * A 64-float vector (256 B) becomes 64 bytes + one double, a 4× memory/IO
  * cut for candidate stores (the coarse tier between full floats and the
  * 64-bit sign sketch of the Hamming ANN).
  *
  * Expression-only and engine-portable by construction: `floor(x + 0.5)`
  * (not `round`, whose half-even/half-up behavior differs across engines)
  * and explicit element-wise double casts make DuckDB mirror every bit, so
  * the gate query hash-compares. Every array input is [[bindOnce]]-bound —
  * scale is referenced per element and would otherwise re-evaluate its whole
  * max-fold per element (the HOF copy footgun).
  */
object Quantize {

  /** (scale DOUBLE, q ARRAY<INT>, err DOUBLE) struct: quantization scale,
    * int8 codes, and the L2 reconstruction error — one pass over the row.
    * Zero vectors quantize to all-zero codes with scale 0. */
  def int8QuantStruct(vecIn: Column): Column = bindOnce(vecIn) { v =>
    bindOnce(array_max(transform(v, x => abs(x.cast("double")))) / lit(127.0)) { s =>
      bindOnce(transform(v, x =>
        when(s === lit(0.0), lit(0))
          .otherwise(greatest(lit(-127.0),
            least(lit(127.0), floor(x.cast("double") / s + lit(0.5)))).cast("int")))) { q =>
        val errSq = aggregate(
          zip_with(v, q, (x, c) =>
            (x.cast("double") - c.cast("double") * s) *
              (x.cast("double") - c.cast("double") * s)),
          lit(0.0), (acc, d) => acc + d)
        struct(s.as("scale"), q.as("q"), sqrt(errSq).as("err"))
      }
    }
  }
}
