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
    val key = col(keyCol)
    val n = page.count

    def keys(rows: Array[Row]): Seq[Long] = rows.toSeq.map(_.getLong(0))

    if (page.cursor >= Cursor.Start && page.cursor != Cursor.End) {
      // Forward page (Start or positive cursor).
      val filtered =
        if (page.cursor == Cursor.Start) df else df.filter(key < page.cursor)
      val fetched = keys(filtered.select(key).orderBy(key.desc).limit(n + 1).collect())
      val displayed = fetched.take(n)
      if (displayed.isEmpty) PagedResult(Nil, Cursor.End, Cursor.End)
      else {
        val next = if (fetched.size > n) displayed.last else Cursor.End
        val prev =
          if (page.cursor == Cursor.Start) Cursor.End
          else {
            val above = df.filter(key > displayed.head).select(key).limit(1).count()
            if (above > 0) -displayed.head else Cursor.End
          }
        PagedResult(displayed, next, prev)
      }
    } else if (page.cursor == Cursor.End) {
      PagedResult(Nil, Cursor.End, Cursor.End)
    } else {
      // Backward page: cursor = −c, rows with key > c ascending; display first n, reversed.
      val c = -page.cursor
      val fetched = keys(df.filter(key > c).select(key).orderBy(key.asc).limit(n + 1).collect())
      val displayedAsc = fetched.take(n)
      if (displayedAsc.isEmpty) PagedResult(Nil, Cursor.End, Cursor.End)
      else {
        val displayed = displayedAsc.reverse
        val prev = if (fetched.size > n) -displayed.head else Cursor.End
        val below = df.filter(key <= c).select(key).limit(1).count()
        val next = if (below > 0) displayed.last else Cursor.End
        PagedResult(displayed, next, prev)
      }
    }
  }

  /** Same pagination but returning whole rows (for `select_edges`). The key column must
    * still be unique; rows come back in display (descending-key) order.
    */
  def paginateRows(df: DataFrame, keyCol: String, page: Page): PagedResult[Row] = {
    val idPage = paginate(df, keyCol, page)
    if (idPage.items.isEmpty) PagedResult(Nil, idPage.nextCursor, idPage.prevCursor)
    else {
      val rows = df
        .filter(col(keyCol).isin(idPage.items: _*))
        .orderBy(col(keyCol).desc)
        .collect()
        .toSeq
      PagedResult(rows, idPage.nextCursor, idPage.prevCursor)
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
