package graft.pipelines

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** HW-2 shredding pipeline goldens (mirroring the reference's fixture
  * invariants: FIXTURES.md §A1/§A2 — pet count, child-row count, a pet
  * with NULL favfoods; metric rows with units attrs; trailing-space and
  * decimal-text preservation).
  */
class PetsNutritionSpec extends SparkSpec {

  test("pets parent: 3 rows, surrogate ids 1..3, one NULL-foods pet") {
    val p = PetsNutrition.pets(spark)
    assert(p.count() == 3)
    assert(p.select("pet_id").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L))
    assert(p.filter(col("fav_foods").isNull).count() == 1)
  }

  test("favfoods child: 3 rows, all referencing valid parents") {
    val child = PetsNutrition.petFavFoods(spark)
    assert(child.count() == 3)
    val orphan = child.join(PetsNutrition.pets(spark), Seq("pet_id"), "left_anti")
    assert(orphan.count() == 0)
  }

  test("daily-values: 4 metrics with units attributes and numeric text") {
    val dv = PetsNutrition.dailyValues(spark).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
    assert(dv == Set(
      ("total-fat", "g", 65.0), ("sodium", "mg", 2400.0),
      ("carb", "g", 300.0), ("protein", "g", 50.0)))
  }

  test("foods: per-food attrs, nested vitamins, edge cases preserved") {
    val f = PetsNutrition.foods(spark).orderBy("name").collect()
    assert(f.length == 2)
    val berry = f(0); val oat = f(1)
    assert(oat.getAs[String]("name") == "Oat Rings")
    assert(oat.getAs[String]("serving_units") == " cup") // leading space kept
    assert(oat.getAs[Int]("calories_total") == 110)
    assert(oat.getAs[Double]("carb") == 22.5)             // decimal text
    assert(berry.getAs[String]("name") == "Berry Mix")    // trailing space trimmed
    assert(berry.getAs[Int]("vitamin_a") == 0)
  }
}
