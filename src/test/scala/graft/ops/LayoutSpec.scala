package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The z-order claim, measured: for a 2-D range predicate, a layout
  * clustered on the Morton curve lets file min/max stats prune MORE
  * files than a layout sorted on one dimension alone. Deterministic
  * corpus + adaptive fixed-arithmetic curve ranges => exact regression
  * pins, valid at any sf (predicate bounds derive from the data's own
  * key ranges). */
class LayoutSpec extends SparkSpec {

  private val files = 64

  test("z-order layout prunes more files than 1-D sort for a 2-D range predicate") {
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_partkey").cast("bigint").as("pk"),
        col("l_suppkey").cast("bigint").as("sk"))
    val total = li.count()
    val (pkMax, skMax) = {
      val r = li.agg(max(col("pk")), max(col("sk"))).head
      (r.getLong(0), r.getLong(1))
    }
    // a tight square in (partkey, suppkey) space — the dashboard "this
    // part family at these suppliers" shape — sized off the key domain
    val (pLo, pHi) = (pkMax / 10, pkMax / 5)
    val (sLo, sHi) = (skMax / 5, skMax / 2)

    // z-order manifest from the operator under test
    val zManifest = Layout.zorderLayout(spark, sfDir, files).collect()
    // 1-D comparison layout: same file COUNT, files = equal row ranges
    // of the pk-sorted order (the best a single-column sort can do)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("pk"), col("sk"))
    val oneD = li.withColumn("rn", row_number().over(w))
      .withColumn("file_id", ((col("rn") - 1) * files / total).cast("int"))
      .groupBy(col("file_id"))
      .agg(min(col("pk")).as("min_part"), max(col("pk")).as("max_part"),
        min(col("sk")).as("min_supp"), max(col("sk")).as("max_supp"))
      .collect()

    def touched(manifest: Array[org.apache.spark.sql.Row]): Int =
      manifest.count { r =>
        val (mnP, mxP) = (r.getAs[Long]("min_part"), r.getAs[Long]("max_part"))
        val (mnS, mxS) = (r.getAs[Long]("min_supp"), r.getAs[Long]("max_supp"))
        mnP <= pHi && mxP >= pLo && mnS <= sHi && mxS >= sLo
      }
    val zTouched = touched(zManifest)
    val dTouched = touched(oneD)
    info(s"files touched: z-order $zTouched/${zManifest.length}, " +
      s"pk-sorted $dTouched/${oneD.length}")
    // the pk-sorted layout localizes pk but scatters sk: every file
    // overlapping the pk range spans most of the sk range and is
    // touched. The z-layout bounds both dims, so fewer files overlap
    // the 2-D square.
    assert(zTouched < dTouched,
      s"z-order must touch fewer files: $zTouched vs $dTouched")
    // sanity: the z manifest covers all rows, file ids stay in range
    assert(zManifest.map(_.getAs[Long]("n_rows")).sum == total)
    assert(zManifest.forall { r =>
      val id = r.getAs[Int]("file_id"); id >= 0 && id < files
    })
  }
}
