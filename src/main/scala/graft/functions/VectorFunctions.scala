package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector similarity over `array<float>` embedding columns (SURVEY.md §2.10).
  *
  * All ops are built from Spark's higher-order array functions (`zip_with`,
  * `aggregate`) so they stay inside Catalyst/codegen — no UDFs, no
  * serialization. Numeric contract (this makes the DuckDB oracle *bit*-exact,
  * not just close): multiply elementwise in FLOAT (matching the storage
  * type), cast each product to DOUBLE, then left-fold-accumulate in DOUBLE.
  * The oracle mirrors the same IEEE op sequence with
  * `list_transform(generate_series)` + `list_reduce`, so both engines produce
  * identical bits and `round(_, 6)` never straddles a boundary differently.
  */
object VectorFunctions {

  /** Dot product: float multiplies, double left-fold sum. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => (x * y).cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  def normSq(a: Column): Column = dot(a, a)

  def norm(a: Column): Column = sqrt(normSq(a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Codegen'd native dot product — bit-identical to [[dot]] (same IEEE op
    * sequence, see [[FloatVecDot]]) but runs inside whole-stage codegen
    * instead of the interpreted higher-order-function path. Use on hot
    * pairwise loops; `dot` remains the reference composition.
    */
  def dotNative(a: Column, b: Column): Column =
    call_function("float_vec_dot", a, b)

  def cosineNative(a: Column, b: Column): Column =
    dotNative(a, b) / (sqrt(dotNative(a, a)) * sqrt(dotNative(b, b)))

  def l2Native(a: Column, b: Column): Column =
    sqrt(call_function("float_vec_l2sq", a, b))

  /** Euclidean distance, same deterministic fold shape. */
  def l2(a: Column, b: Column): Column =
    sqrt(aggregate(
      zip_with(a, b, (x, y) => {
        val d = (x - y).cast("double"); d * d
      }),
      lit(0.0),
      (acc, v) => acc + v))

  /** Sign-bit LSH bucket for approximate NN: hash each dimension's
    * contribution with a seeded deterministic pseudo-hyperplane (no RNG —
    * Date/Math.random would break plan determinism). `nBits` sign bits packed
    * into a long. Vectors in the same bucket are candidate neighbors; the
    * scale path probes only matching buckets instead of all pairs.
    *
    * The pseudo-hyperplane for (bit i, dim j) is derived from xxhash64(i, j)
    * mapped to [-1, 1] — fully deterministic and computable inside codegen.
    */
  def signLshBucket(v: Column, nBits: Int): Column = {
    val bits = (0 until nBits).map { i =>
      // projection_i = sum_j v[j] * h(i, j), h in [-1, 1]
      val proj = aggregate(
        zip_with(v, sequence(lit(0), size(v) - 1), (x, j) => {
          val h = pmod(xxhash64(lit(i.toLong), j.cast("long")), lit(2000001L))
          x.cast("double") * ((h.cast("double") / lit(1000000.0)) - lit(1.0))
        }),
        lit(0.0),
        (acc, x) => acc + x)
      when(proj >= 0, lit(1L) * lit(1L << i)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** [[signLshBucket]] with an md5-derived hyperplane family instead of
    * xxhash64: h(i, j) = md5("i,j") top-60-bits mod 2000001, scaled to
    * [-1, 1]. Identical structure, but every op (md5, hex parse, mod,
    * double scale, in-order fold) is exactly reproducible in DuckDB, so the
    * LSH-bucketed pairwise path can carry the differential oracle. Engine
    * default stays [[signLshBucket]] (xxhash64 is ~20× cheaper per plane).
    */
  def signLshBucketMd5(v: Column, nBits: Int): Column = {
    val bits = (0 until nBits).map { i =>
      val proj = aggregate(
        zip_with(v, sequence(lit(0), size(v) - 1), (x, j) => {
          val h = pmod(
            conv(substring(md5(concat(lit(s"$i,"), j.cast("string"))), 1, 15),
              16, 10).cast("long"),
            lit(2000001L))
          x.cast("double") * ((h.cast("double") / lit(1000000.0)) - lit(1.0))
        }),
        lit(0.0),
        (acc, x) => acc + x)
      when(proj >= 0, lit(1L << i)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }
}
