package graft.queries

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.model.{Cursor, Page, PagedResult}

/** Keyset ("cursor") pagination — reference semantics (`Cursor.scala:19-30`,
  * `SqlShard.scala:258-277`, `ResultWindow.scala:42-59`, goldens
  * `unit/SqlShardSpec.scala:218-236`):
  *
  *  - cursor `-1` (Start): first page, descending by key.
  *  - positive cursor c: rows with `key < c`, descending.
  *  - negative cursor −c: backward page — rows with `key > c` ascending, first `n`,
  *    displayed in descending order.
  *  - `nextCursor` = key of the last displayed row when more rows exist below, else End(0);
  *    `prevCursor` = −(key of the first displayed row) when rows exist above, else End.
  *
  * The page itself is collected to the driver — pages are client-sized by contract
  * (the reference caps them at a few thousand rows); everything before the `limit`
  * stays distributed. The reference fuses its has-prev/has-next probe into the page
  * query with UNION ALL (`SqlShard.scala:268-271`); we fold it into the same collect
  * by over-fetching n+1 and issuing one 1-row opposite-direction probe.
  */
object Pagination {

  /** Paginate `df` by `keyCol` (must be unique per row). Returns the page of key values. */
  def paginate(df: DataFrame, keyCol: String, page: Page): PagedResult[Long] = {
    val rows = paginateRows(df.select(col(keyCol)), keyCol, page)
    PagedResult(rows.items.map(_.getLong(0)), rows.nextCursor, rows.prevCursor)
  }

  /** Pagination returning whole rows in display (descending-key) order — ONE pass over
    * the input: the page itself is a single `limit(n+1)` collect carrying every payload
    * column (no re-query of the snapshot per page), plus at most one 1-row probe for the
    * opposite-direction cursor. Jobs per page ≤ 2 (first forward page needs no probe).
    */
  def paginateRows(df: DataFrame, keyCol: String, page: Page): PagedResult[Row] = {
    val key = col(keyCol)
    val n = page.count
    def k(r: Row): Long = r.getLong(r.fieldIndex(keyCol))

    if (page.cursor == Cursor.End) {
      PagedResult(Nil, Cursor.End, Cursor.End)
    } else if (page.cursor >= Cursor.Start) {
      // Forward page (Start or positive cursor).
      val filtered =
        if (page.cursor == Cursor.Start) df else df.filter(key < page.cursor)
      val fetched = filtered.orderBy(key.desc).limit(n + 1).collect().toSeq
      val displayed = fetched.take(n)
      if (displayed.isEmpty) PagedResult(Nil, Cursor.End, Cursor.End)
      else {
        val next = if (fetched.size > n) k(displayed.last) else Cursor.End
        val prev =
          if (page.cursor == Cursor.Start) Cursor.End
          else {
            val above = df.filter(key > k(displayed.head)).select(key).limit(1).count()
            if (above > 0) -k(displayed.head) else Cursor.End
          }
        PagedResult(displayed, next, prev)
      }
    } else {
      // Backward page: cursor = −c, rows with key > c ascending; display first n, reversed.
      val c = -page.cursor
      val fetched = df.filter(key > c).orderBy(key.asc).limit(n + 1).collect().toSeq
      val displayedAsc = fetched.take(n)
      if (displayedAsc.isEmpty) PagedResult(Nil, Cursor.End, Cursor.End)
      else {
        val displayed = displayedAsc.reverse
        val prev = if (fetched.size > n) -k(displayed.head) else Cursor.End
        val below = df.filter(key <= c).select(key).limit(1).count()
        val next = if (below > 0) k(displayed.last) else Cursor.End
        PagedResult(displayed, next, prev)
      }
    }
  }

  /** Declarative (fully distributed) form of one forward page, for use inside larger
    * plans and the duckdb oracle: `key < cursor` → sort desc → limit. No driver collect.
    */
  def pageDF(df: DataFrame, keyCol: Column, page: Page): DataFrame = {
    val filtered =
      if (page.cursor == Cursor.Start) df
      else if (page.cursor > 0) df.filter(keyCol < page.cursor)
      else df.filter(keyCol > -page.cursor)
    filtered.orderBy(keyCol.desc).limit(page.count)
  }
}
