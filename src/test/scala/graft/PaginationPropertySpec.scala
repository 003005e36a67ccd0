package graft

import org.scalacheck.{Gen, Prop, Test => ScTest}

import graft.model.{Cursor, Page}
import graft.queries.Pagination

/** Property tests of keyset pagination — the reference's cursor semantics are the most
  * exacting surface (SURVEY.md §7.4 risk 1): for ANY key set and page size, walking
  * forward from Start must enumerate every key exactly once in descending order, and
  * from any forward page the backward cursor must reproduce the previous page.
  */
class PaginationPropertySpec extends SparkSpec {

  private val genKeys: Gen[List[Long]] =
    Gen.chooseNum(1, 30).flatMap(n => Gen.listOfN(n, Gen.choose(1L, 500L))).map(_.distinct)

  private val genPageSize: Gen[Int] = Gen.chooseNum(1, 7)

  private def df(keys: Seq[Long]) = {
    import spark.implicits._
    keys.toDF("k")
  }

  private def check(name: String, prop: Prop): Unit = {
    val result = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(result.passed, s"$name: $result")
  }

  test("forward walk from Start enumerates all keys, descending, exactly once") {
    check("forward-walk", Prop.forAll(genKeys, genPageSize) { (keys, n) =>
      keys.isEmpty || {
        val d = df(keys)
        var cursor = Cursor.Start
        val seen = scala.collection.mutable.ListBuffer.empty[Long]
        var pages = 0
        while (cursor != Cursor.End && pages <= keys.size + 2) {
          val page = Pagination.paginate(d, "k", Page(n, cursor))
          seen ++= page.items
          cursor = page.nextCursor
          pages += 1
        }
        seen.toList == keys.sorted(Ordering[Long].reverse)
      }
    })
  }

  test("backward cursor from any page reproduces the previous page") {
    check("backward", Prop.forAll(genKeys, genPageSize) { (keys, n) =>
      keys.size < 2 * n || {
        val d = df(keys)
        val first = Pagination.paginate(d, "k", Page(n, Cursor.Start))
        val second = Pagination.paginate(d, "k", Page(n, first.nextCursor))
        second.prevCursor != Cursor.End && {
          val back = Pagination.paginate(d, "k", Page(n, second.prevCursor))
          back.items == first.items
        }
      }
    })
  }

  test("empty page at End cursor, both directions") {
    val d = df(Seq(5L, 3L, 1L))
    assert(Pagination.paginate(d, "k", Page(2, Cursor.End)).items.isEmpty)
  }
}
