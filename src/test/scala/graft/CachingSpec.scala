package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Caching, TextOps}

/** Pins the scoped-cache contract ([[graft.ops.Caching]]): ops-internal
  * caches registered inside a `withCached` scope are released at scope
  * exit, nested scopes release only their own, and outside any scope the
  * behavior is exactly `.cache()` (the graded-harness contract, where
  * Verify/Bench clear between queries).
  */
class CachingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("withCached(df)(body) caches for the body and releases at exit") {
    val base = spark.range(100).toDF("x")
    val out = Caching.withCached(base) { c =>
      assert(c.storageLevel != StorageLevel.NONE, "cached inside the scope")
      c.groupBy().sum("x").as[Long].head()
    }
    assert(out == 4950L)
    assert(base.storageLevel == StorageLevel.NONE, "released at scope exit")
  }

  test("nested scopes release only their own caches; exceptions still release") {
    // semantically DISTINCT plans: the cache manager matches by canonical
    // plan (sameResult), so two same-shaped frames would alias one entry
    val a = spark.range(10).toDF("a")
    val b = spark.range(20).toDF("b")
    var innerRef: DataFrame = null
    Caching.withCached(a) { ca =>
      intercept[RuntimeException] {
        Caching.withCached(b) { cb =>
          innerRef = cb
          assert(cb.storageLevel != StorageLevel.NONE)
          throw new RuntimeException("boom")
        }
      }
      assert(innerRef.storageLevel == StorageLevel.NONE, "inner scope released on throw")
      assert(ca.storageLevel != StorageLevel.NONE, "outer scope survives the inner exit")
    }
    assert(a.storageLevel == StorageLevel.NONE)
  }

  test("operator-internal caches register with the enclosing scope and are released") {
    val docs = (0L until 40L)
      .map(i => (i, s"alpha beta gamma delta tok$i common words here"))
      .toDF("doc_id", "text")
    var registered = -1
    var inside: Long = -1L
    val outside = TextOps.tfidfTopTerms(docs, "doc_id", "text", 3).count()
    Caching.withCached {
      val res = TextOps.tfidfTopTerms(docs, "doc_id", "text", 3)
      registered = Caching.registeredInCurrentScope
      inside = res.count()
    }
    // the operator's internal tf cache registered at plan-construction time
    assert(registered > 0, "ops-internal scopedCache registered with the scope")
    // results are identical in and out of a scope (caching is perf-only)
    assert(inside == outside)
  }
}
