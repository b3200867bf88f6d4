package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector primitives over `array<float>` embedding columns.
  *
  * Pure higher-order-function expressions (`aggregate`/`zip_with`) — no
  * UDFs, so the dot products stay in codegen and vectorize over the parquet
  * scan. All arithmetic is promoted to double before accumulation for
  * cross-engine numeric parity.
  */
object VectorFunctions {

  /** Σ aᵢ·bᵢ with left-to-right accumulation in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** ‖a‖₂ */
  def norm2(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double")))

  /** Cosine similarity. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm2(a) * norm2(b))

  /** Squared euclidean distance. */
  def l2sq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => {
      val d = x.cast("double") - y.cast("double"); d * d
    }), lit(0.0), (acc, v) => acc + v)

  /** Random-hyperplane signature of a vector: for each seeded pseudo-random
    * hyperplane, the sign bit of the projection — the LSH family for cosine
    * distance (SimHash over embeddings). Hyperplane components are derived
    * deterministically from (seed, plane, dim) via a splitmix64-style hash
    * so executors need no broadcast of random matrices. */
  def hyperplaneSignature(vec: Column, numPlanes: Int, seed: Long = 42L): Column = {
    val dims = 0 // runtime-length arrays: use transform over positions
    val planes = (0 until numPlanes).map { p =>
      // projection = Σ_i vec[i] * h(seed, p, i), h in [-1, 1)
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1), (v, i) => {
          val h = pseudoUniform(lit(seed), lit(p), i)
          v.cast("double") * h
        }),
        lit(0.0), (acc, v) => acc + v)
      when(proj >= 0, lit(1)).otherwise(lit(0))
    }
    array(planes: _*)
  }

  /** Deterministic pseudo-uniform in [-1, 1) from integer inputs, built on
    * xxhash64 (codegen'd). */
  def pseudoUniform(seed: Column, plane: Column, i: Column): Column =
    (pmod(xxhash64(seed, plane, i), lit(1000000L)).cast("double") / 500000.0) - 1.0

  /** Pack a 0/1 signature array into a long bucket id (numPlanes ≤ 63). */
  def signatureToBucket(sig: Column): Column =
    aggregate(sig, lit(0L), (acc, bit) => acc * 2 + bit.cast("long"))
}
