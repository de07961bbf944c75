package graft.catalog

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CatalogSpec extends SparkSpec {
  import spark.implicits._

  private lazy val assets = (1 to 25).map { i =>
    (if (i <= 20) "db1" else "db2", f"a$i%03d", s"Asset $i", i % 5 == 0)
  }.toDF("databaseId", "assetId", "assetName", "archived")

  test("point lookup returns exactly the keyed row (S1)") {
    val got = Catalog.getAsset(assets, "db1", "a007")
    assert(got.select("assetName").as[String].collect().toSeq == Seq("Asset 7"))
  }

  test("listAssets pages keyset-style in reverse order (S2+O6+O7)") {
    val page1 = Catalog.listAssets(assets, "db1", pageSize = 5)
      .select("assetId").as[String].collect().toSeq
    assert(page1 == Seq("a019", "a018", "a017", "a016", "a014")) // a015,a020 archived
    val token = Catalog.nextToken(page1.last) // opaque base64, O6 contract
    assert(token != page1.last)
    val page2 = Catalog.listAssets(assets, "db1",
      afterToken = Some(token), pageSize = 5)
      .select("assetId").as[String].collect().toSeq
    assert(page2 == Seq("a013", "a012", "a011", "a009", "a008"))
  }

  test("archived rows excluded unless requested (F9)") {
    assert(Catalog.scanAssets(assets).count() == 20)
    assert(Catalog.scanAssets(assets, includeArchived = true).count() == 25)
  }

  test("countAssets applies the policy predicate pushed down (A5+F11)") {
    val n = Catalog.countAssets(assets, col("databaseId") === "db1")
      .as[Long].head()
    assert(n == 16) // 20 db1 rows minus 4 archived
  }
}
