package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** MinHash / SimHash building blocks over token or shingle arrays.
  *
  * All of it is built from Spark higher-order functions + `xxhash64`
  * (codegen'd), so signatures are computed per-row in the scan stage with
  * zero shuffles; the only shuffle in an LSH dedup is the band-bucket join.
  */
object HashFunctions {

  /** k-permutation MinHash signature (array<long>, length k) in ONE pass
    * over the shingle array: fold with a k-wide accumulator, updating all
    * k mins per element via zip_with against per-permutation seeds. The
    * "permutations" are k independent seeded xxhash64 functions — no
    * modular arithmetic, so no ANSI overflow and full codegen.
    * Empty input → signature of all Long.MaxValue (sentinel).
    */
  def minhashSignature(shingles: Column, k: Int): Column = {
    val seeds = array((0 until k).map(i => lit(i.toLong * 0x9E37 + 17)): _*)
    val init = array_repeat(lit(Long.MaxValue), k)
    aggregate(shingles, init, (acc, s) =>
      zip_with(acc, seeds, (m, seed) => least(m, xxhash64(seed, s))))
  }

  /** Band keys for LSH: split the k-signature into `bands` bands of
    * k/bands rows each; key = (band index, xxhash64 of the band slice).
    * Returns array<struct<band:int, bh:bigint>> — explode then group/join
    * on (band, bh) to get candidate pairs.
    */
  def lshBands(signature: Column, k: Int, bands: Int): Column = {
    require(k % bands == 0, s"k=$k not divisible by bands=$bands")
    val r = k / bands
    transform(sequence(lit(0), lit(bands - 1)), b =>
      struct(b.cast("int").as("band"),
        xxhash64(b, slice(signature, b * r + 1, lit(r))).as("bh")))
  }

  /** Estimated Jaccard from two MinHash signatures: fraction of agreeing
    * components.
    */
  def minhashJaccard(sigA: Column, sigB: Column): Column =
    aggregate(zip_with(sigA, sigB, (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), (acc, v) => acc + v).cast("double") / size(sigA)

  /** Exact Jaccard over two string arrays (as sets). */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val union = size(array_union(a, b)).cast("double")
    when(union === 0, lit(0.0)).otherwise(inter / union)
  }

  /** 64-bit SimHash over a token array: per bit, sum +1/-1 votes from each
    * token's xxhash64; bit set iff vote > 0. One pass, 64-wide accumulator.
    */
  def simhash64(toks: Column): Column = {
    val masks = array((0 until 64).map(i => lit(1L << i)): _*)
    val votes = aggregate(
      transform(toks, t => xxhash64(t)),
      array_repeat(lit(0), 64),
      (acc, h) => zip_with(acc, masks,
        (v, m) => v + when(h.bitwiseAND(m) =!= 0, 1).otherwise(-1)))
    // set bit i iff vote i > 0; OR-fold the per-bit masks (no overflow)
    aggregate(zip_with(votes, masks, (v, m) => when(v > 0, m).otherwise(lit(0L))),
      lit(0L), (acc, m) => acc.bitwiseOR(m))
  }

  /** Hamming distance between two 64-bit simhashes. */
  def hamming64(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))
}
