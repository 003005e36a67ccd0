package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Vector math is pure column expressions (`transform`/`zip_with`/`aggregate` → whole-stage
  * codegen). All arithmetic in double (floats upcast first) so the DuckDB oracle computes
  * the same values; outputs round to 6 decimals.
  *
  * Scale path: brute force is O(|Q|·|C|) — fine for small query sets against broadcastable
  * candidate sets; the LSH-bucketed variant shuffle-partitions candidates by bucket so the
  * join is equi-key and each bucket's work is local.
  */
object Similarity {

  /** Sequential left-to-right dot product of two double arrays. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm2(a: Column): Column = dot(a, a)

  private def toDouble(a: Column): Column = transform(a, _.cast("double"))

  def cosine(a: Column, b: Column): Column = {
    val (da, db) = (toDouble(a), toDouble(b))
    dot(da, db) / sqrt(norm2(da) * norm2(db))
  }

  /** Brute-force cosine top-k: `queries` (small) × `candidates`, ranked per query.
    * The query side is broadcast; candidates stream through in one pass.
    */
  def bruteForceTopK(
      queries: DataFrame,
      candidates: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int
  ): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")))
    val c = candidates.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = q
      .crossJoin(c)
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), round(cosine(col("qv"), col("cv")), 6).as("cos_sim"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Deterministic ±1 random-hyperplane weight for (dimension i, plane j) — pure integer
    * arithmetic so the oracle reproduces the same planes: +1 iff (i·(2j+3) + j) is even.
    */
  private def planeWeight(i: Column, j: Int): Column =
    when((i * (2 * j + 3) + j) % 2 === 0, lit(1.0)).otherwise(lit(-1.0))

  /** LSH bucket id from `nPlanes` random hyperplanes: bit j = [⟨v, h_j⟩ ≥ 0]. */
  def lshBucket(vec: Column, nPlanes: Int): Column = {
    val v = toDouble(vec)
    (0 until nPlanes)
      .map { j =>
        val proj = aggregate(
          zip_with(v, transform(sequence(lit(0), size(v) - 1), i => planeWeight(i, j)), (x, w) => x * w),
          lit(0.0),
          (acc, x) => acc + x
        )
        when(proj >= 0, lit(1L << j)).otherwise(lit(0L))
      }
      .reduce(_ + _)
  }

  /** LSH-bucketed ANN: queries only compare against candidates in the same hyperplane
    * bucket (recall < 1 by design — the scale path when |Q|·|C| is infeasible).
    */
  def lshTopK(
      queries: DataFrame,
      candidates: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nPlanes: Int = 6
  ): DataFrame = {
    val q = queries.select(
      col(idCol).as("query_id"), col(vecCol).as("qv"), lshBucket(col(vecCol), nPlanes).as("bucket"))
    val c = candidates.select(
      col(idCol).as("neighbor_id"), col(vecCol).as("cv"), lshBucket(col(vecCol), nPlanes).as("bucket"))
    val scored = q
      .join(c, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), round(cosine(col("qv"), col("cv")), 6).as("cos_sim"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Embedding-cosine near-duplicate pairs above a threshold (symmetric, id_a < id_b). */
  def nearDupPairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double
  ): DataFrame = {
    val a = df.select(col(idCol).as("id_a"), col(vecCol).as("va"))
    val b = df.select(col(idCol).as("id_b"), col(vecCol).as("vb"))
    a.crossJoin(broadcast(b))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), round(cosine(col("va"), col("vb")), 6).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
  }
}
