package graft

import org.apache.spark.storage.StorageLevel

class CachesSpec extends SparkSpecBase {
  import spark.implicits._

  test("scoped release drops only the scope's caches, global release spares scoped frames") {
    val outer = Caches.tracked(Seq((1, "a")).toDF("k", "v"))
    outer.count()
    assert(outer.storageLevel != StorageLevel.NONE)
    var inner: org.apache.spark.sql.DataFrame = null
    Caches.scoped {
      inner = Caches.tracked(Seq((2, "b")).toDF("k", "v"))
      inner.count() // materialize inside the scope, like s14's checkpoint
      assert(inner.storageLevel != StorageLevel.NONE, "cached inside the scope")
    }
    assert(inner.storageLevel == StorageLevel.NONE, "scope exit must release its frames")
    assert(outer.storageLevel != StorageLevel.NONE,
      "the scope must not touch caches tracked outside it")
    // the scoped frame never entered the global registry: a later
    // global release (another query's cadence) has nothing of ours
    Caches.release()
    assert(outer.storageLevel == StorageLevel.NONE, "global release still covers outer")
  }

  test("scopes nest: the inner scope releases its frames and restores the outer") {
    var outerDf: org.apache.spark.sql.DataFrame = null
    var innerDf: org.apache.spark.sql.DataFrame = null
    var lateOuterDf: org.apache.spark.sql.DataFrame = null
    Caches.scoped {
      outerDf = Caches.tracked(Seq((10, "x")).toDF("k", "v")); outerDf.count()
      Caches.scoped {
        innerDf = Caches.tracked(Seq((11, "y")).toDF("k", "v")); innerDf.count()
      }
      assert(innerDf.storageLevel == StorageLevel.NONE, "inner scope released its frame")
      assert(outerDf.storageLevel != StorageLevel.NONE, "outer frame survives the inner exit")
      // frames tracked AFTER the inner scope must land in the outer
      // scope, not the global registry (the restore contract)
      lateOuterDf = Caches.tracked(Seq((12, "z")).toDF("k", "v")); lateOuterDf.count()
    }
    assert(outerDf.storageLevel == StorageLevel.NONE)
    assert(lateOuterDf.storageLevel == StorageLevel.NONE,
      "post-inner frames belong to the outer scope and die with it")
  }

  test("tracked is idempotent on an already-cached plan") {
    val df = Seq((3, "c")).toDF("k", "v")
    val t1 = Caches.tracked(df)
    val t2 = Caches.tracked(t1) // second call must not double-register
    t2.count()
    assert(t2.storageLevel != StorageLevel.NONE)
    Caches.release()
    assert(t1.storageLevel == StorageLevel.NONE)
  }
}
