package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines (exact, MinHash+LSH, SimHash,
  * n-gram Jaccard). Hashing is md5-based so the DuckDB oracle can reproduce signatures
  * byte-for-byte (md5 hex is lowercase and lexicographically comparable in both engines).
  *
  * Scale shape: everything is explode → hash-aggregate → equi-join. Candidate generation
  * is inverted-index / LSH-band joins — never an all-pairs cross join — so the plans hold
  * when the corpus is 10^9 documents (band keys / shingles shuffle-partition the work).
  */
object Dedup {

  /** Exact dedup: hash-groupBy on content. Output: one row per distinct content with the
    * kept (minimum) id and the duplicate count.
    */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("text_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Word n-gram shingles, distinct per document: (id, shingle). One narrow map + explode
    * — no shuffle until the consumer aggregates.
    */
  def shingles(df: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame = {
    val toks = split(col(textCol), " ", -1)
    // guard: sequence(a, b) is DESCENDING when a > b, so short docs need the empty array
    val windows = when(
      size(toks) >= n,
      transform(sequence(lit(1), size(toks) - n + 1), i => concat_ws(" ", slice(toks, i, lit(n))))
    ).otherwise(array().cast("array<string>"))
    df.select(col(idCol), explode(windows).as("shingle")).distinct()
  }

  /** MinHash signatures: for permutation k, minhash_k = min over shingles of
    * md5(k || '|' || shingle) — the md5-as-permutation trick keeps it oracle-reproducible.
    * Output: (id, k, minhash).
    */
  def minhash(sh: DataFrame, idCol: String, numHashes: Int): DataFrame =
    sh.select(
        col(idCol),
        explode(sequence(lit(0), lit(numHashes - 1))).as("k"),
        col("shingle")
      )
      .groupBy(col(idCol), col("k"))
      .agg(min(md5(concat(col("k").cast("string"), lit("|"), col("shingle")))).as("minhash"))

  /** MinHash + LSH banding: documents sharing any band signature become candidate
    * duplicate pairs. numHashes = bands × rowsPerBand.
    */
  def minhashLshPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      bands: Int = 4,
      rowsPerBand: Int = 4
  ): DataFrame = {
    val numHashes = bands * rowsPerBand
    val mh = minhash(shingles(df, idCol, textCol, shingleSize), idCol, numHashes)
    val bandSigs = mh
      .withColumn("band", (col("k") / rowsPerBand).cast("int"))
      .groupBy(col(idCol), col("band"))
      .agg(
        array_join(
          transform(array_sort(collect_list(struct(col("k"), col("minhash")))), _.getField("minhash")),
          ""
        ).as("sig")
      )
    val a = bandSigs.select(col("band"), col("sig"), col(idCol).as("id_a"))
    val b = bandSigs.select(col("band"), col("sig"), col(idCol).as("id_b"))
    a.join(b, Seq("band", "sig"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
  }

  /** SimHash: 16-bit signature from per-token md5 hex-digit parities. Bit i of the
    * signature is the sign of Σ_tokens (2·parity(hexdigit_i(md5(token))) − 1).
    */
  def simhash(df: DataFrame, idCol: String, textCol: String, bits: Int = 16): DataFrame = {
    val toks = TextStats.tokens(df, idCol, textCol).select(col(idCol), col("token")).distinct()
    val withHash = toks.withColumn("h", md5(col("token")))
    val bitSums = (0 until bits).map { i =>
      sum((ascii(substring(col("h"), i + 1, 1)) % 2 * 2 - 1).cast("long")).as(s"s$i")
    }
    val sums = withHash.groupBy(col(idCol)).agg(bitSums.head, bitSums.tail: _*)
    val sig = (0 until bits)
      .map(i => when(col(s"s$i") >= 0, lit(1L << i)).otherwise(lit(0L)))
      .reduce(_ + _)
    sums.select(col(idCol), sig.as("simhash"))
  }

  /** n-gram Jaccard near-dup: inverted-index self-join on shingles (candidates = pairs
    * sharing ≥1 shingle), then |∩| / |∪| ≥ threshold. The only float is one final
    * division of two exact integers.
    */
  def ngramJaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      threshold: Double = 0.2
  ): DataFrame = {
    val sh = shingles(df, idCol, textCol, shingleSize)
    val sizes = sh.groupBy(col(idCol)).agg(count(lit(1)).as("n"))
    val common = sh.select(col(idCol).as("id_a"), col("shingle"))
      .join(sh.select(col(idCol).as("id_b"), col("shingle")), Seq("shingle"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_common"))
    common
      .join(sizes.select(col(idCol).as("id_a"), col("n").as("n_a")), Seq("id_a"))
      .join(sizes.select(col(idCol).as("id_b"), col("n").as("n_b")), Seq("id_b"))
      .withColumn(
        "jaccard",
        round(col("n_common").cast("double") /
          (col("n_a") + col("n_b") - col("n_common")).cast("double"), 6)
      )
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }
}
