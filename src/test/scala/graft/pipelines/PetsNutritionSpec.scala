package graft.pipelines

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** HW-2 shredding pipeline goldens (mirroring the reference's fixture
  * invariants: FIXTURES.md §A1/§A2 — pet count, child-row count, a pet
  * with NULL favfoods; metric rows with units attrs; trailing-space and
  * decimal-text preservation).
  */
class PetsNutritionSpec extends SparkSpec {

  test("pets parent: 5 rows, surrogate ids 1..5, one NULL-foods pet") {
    val p = PetsNutrition.pets(spark)
    assert(p.count() == 5)
    assert(p.select("pet_id").collect().map(_.getLong(0)).sorted.toSeq ==
      (1L to 5L).toSeq)
    assert(p.filter(col("fav_foods").isNull).count() == 1)
    // the two scalar favFoods pets arrive coerced to one-element arrays
    assert(p.filter(size(col("fav_foods")) === 1).count() == 3)
  }

  test("favfoods child: 5 rows (scalar-coerced included), valid parents") {
    val child = PetsNutrition.petFavFoods(spark)
    assert(child.count() == 5)
    assert(child.filter(col("food") === "tuna").count() == 1)
    assert(child.filter(col("food") === "<strong>any</strong> food").count() == 1)
    val orphan = child.join(PetsNutrition.pets(spark), Seq("pet_id"), "left_anti")
    assert(orphan.count() == 0)
  }

  test("daily-values: all 7 metrics with units attributes and numeric text") {
    val dv = PetsNutrition.dailyValues(spark).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
    assert(dv == Set(
      ("total-fat", "g", 65.0), ("saturated-fat", "g", 21.0),
      ("cholesterol", "mg", 290.0), ("sodium", "mg", 2400.0),
      ("carb", "g", 300.0), ("fiber", "g", 24.0), ("protein", "g", 50.0)))
  }

  test("foods: full field set incl. flat nutrients, vitamins, minerals") {
    val f = PetsNutrition.foods(spark).orderBy("name").collect()
    assert(f.length == 2)
    val berry = f(0); val oat = f(1)
    assert(oat.getAs[String]("name") == "Oat Rings")
    assert(oat.getAs[String]("serving") == "1")
    assert(oat.getAs[String]("serving_units") == " cup") // leading space kept
    assert(oat.getAs[Int]("calories_total") == 110)
    assert(oat.getAs[Double]("carb") == 22.5)             // decimal text
    assert(oat.getAs[Double]("saturated_fat") == 0.5)
    assert(oat.getAs[Double]("sodium") == 190.0)
    assert(oat.getAs[Double]("fiber") == 3.0)
    assert(oat.getAs[Double]("mineral_ca") == 10.0)
    assert(oat.getAs[Double]("mineral_fe") == 45.0)
    assert(berry.getAs[String]("name") == "Berry Mix")    // trailing space trimmed
    assert(berry.getAs[Double]("vitamin_a") == 0.0)
    assert(berry.getAs[Double]("vitamin_c") == 45.0)
    assert(berry.getAs[Double]("cholesterol") == 0.0)
  }
}
