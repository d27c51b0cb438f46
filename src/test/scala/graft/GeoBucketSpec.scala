package graft

import org.apache.spark.sql.functions._
import graft.functions._

/** R5/A3 scale path: grid bucketing prunes radius queries to the cells
  * intersecting the query circle (the distributed stand-in for the
  * reference's per-table R-tree). */
class GeoBucketSpec extends SparkSpec {
  import spark.implicits._

  lazy val points = {
    val rnd = new scala.util.Random(11)
    (0 until 2000).map { i =>
      (i.toLong, rnd.nextDouble() * 170 - 85, rnd.nextDouble() * 350 - 175)
    }.toDF("id", "lat", "lon")
      .withColumn("cell", geo_cell(col("lat"), col("lon"), 5.0))
  }

  test("cell-pruned radius query returns exactly the full-scan result") {
    val (cLat, cLon, r) = (40.0, -75.0, 800.0)
    val full = points
      .filter(haversine_km(col("lat"), col("lon"), lit(cLat), lit(cLon)) <= r)
      .select("id").collect().map(_.getLong(0)).toSet
    val cells = geoCellsForRadius(cLat, cLon, r, 5.0)
    val pruned = points
      .filter(col("cell").isin(cells: _*)) // partition/bucket prune
      .filter(haversine_km(col("lat"), col("lon"), lit(cLat), lit(cLon)) <= r) // re-check
      .select("id").collect().map(_.getLong(0)).toSet
    assert(pruned == full, s"pruned ${pruned.size} vs full ${full.size}")
    // and the pruning actually prunes
    val scanned = points.filter(col("cell").isin(cells: _*)).count()
    assert(scanned < points.count() / 2, s"scanned $scanned of 2000 — no pruning")
  }

  test("cells cover the poles and antimeridian edges without error") {
    Seq((89.5, 179.5, 100.0), (-89.5, -179.5, 100.0), (0.0, 0.0, 10.0)).foreach {
      case (la, lo, r) => assert(geoCellsForRadius(la, lo, r, 5.0).nonEmpty)
    }
  }
}
