package graft.pipeline

import org.apache.spark.sql.DataFrame

/** Scan-parallelism guard for the per-row-heavy operators (tokenize / shingle /
  * hash): parquet cannot split a row group, so a source written as few fat row
  * groups scans as few tasks — and everything BEFORE the first shuffle (the
  * explode + md5 work that dominates the text operators) then runs near-serially
  * no matter how many cores the session has. Real lakehouse tables have thousands
  * of row groups and never trigger this; the guard exists for the pathological
  * under-partitioned read (one fat file, a coalesced upstream write).
  *
  * Deliberately NOT applied to the embedding/media operators: measured at sf0.1,
  * fanning the 2000-row vector tables out made that family ~30% SLOWER (the added
  * exchange outweighs the serial dot-product pass — per-row vector math is far
  * cheaper per byte than tokenize+md5). Apply only where the per-row work dwarfs
  * one extra shuffle of the input.
  */
object Scans {

  /** Repartition `df` to the session's default parallelism iff its scan is
    * under-partitioned by more than 4× — so a well-partitioned 100 TB input is
    * NEVER gratuitously reshuffled (the check is plan-side only; no job runs), while
    * a single-row-group file fans out once before the expensive per-row work.
    * Correctness-neutral: every consumer here is order-free (hash-aggs, equi-joins,
    * per-document windows).
    */
  private[pipeline] def fanOut(df: DataFrame): DataFrame = {
    // a streaming relation has no .rdd to inspect (and its micro-batch sizing is
    // the source's job) — pass it through untouched so the shared text kernels
    // stay usable from the streaming twins
    if (df.isStreaming) return df
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions.toLong * 4 < target) df.repartition(target) else df
  }
}
