package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{Explode, Shred}

/** The HW-2 shredding pipeline end-to-end (SURVEY.md §3 entry point #4):
  * latest JSON blob → pets parent + favfoods child tables (S3, F13, K2,
  * J4); latest XML blob → daily-values + foods tables (S4, F15).
  *
  * Fixture documents mirror the reference STRUCTURE (`HW-2/init/init.sql:
  * 12-38` pets JSON; `:49-270` nutrition XML: metric elements with a
  * units attribute, per-food attribute-only calories, nested vitamin
  * groups) with this repo's own values.
  *
  * All extraction is native expressions (`from_json`, `xpath_*`) — the
  * shred stage pipelines inside the scan with no shuffle; only the
  * surrogate-id window (mart-sized parent, SURVEY §7.4 trap 4) sorts.
  */
object PetsNutrition {

  /** Five pets covering the favFoods variants the reference coerces
    * (F14, `sources_to_linear.py:55-57`): array, absent, scalar string,
    * and an HTML-ish scalar (FIXTURES.md §A1 robustness case).
    */
  val petsJson: String =
    """{"pets":[
      |{"name":"Rex","species":"dog","favFoods":["beef","chicken"],"birthYear":2019,"photo":"rex.png"},
      |{"name":"Mia","species":"cat","birthYear":2021,"photo":"mia.png"},
      |{"name":"Bub","species":"fish","favFoods":["flakes"],"birthYear":2022,"photo":"bub.png"},
      |{"name":"Tom","species":"cat","favFoods":"tuna","birthYear":2018,"photo":"tom.png"},
      |{"name":"Zoe","species":"parrot","favFoods":"<strong>any</strong> food","birthYear":2020,"photo":"zoe.png"}
      |]}""".stripMargin.replace("\n", "")

  /** Full nutrition document structure (`HW-2/init/init.sql:49-270`):
    * 7 daily-value metrics with units attributes; per-food text fields,
    * attribute-only calories, flat nutrient elements, and the nested
    * vitamins/minerals groups — with this repo's own values.
    */
  val nutritionXml: String =
    """<nutrition>
      |<daily-values>
      |<total-fat units="g">65</total-fat>
      |<saturated-fat units="g">21</saturated-fat>
      |<cholesterol units="mg">290</cholesterol>
      |<sodium units="mg">2400</sodium>
      |<carb units="g">300</carb>
      |<fiber units="g">24</fiber>
      |<protein units="g">50</protein>
      |</daily-values>
      |<food><name>Oat Rings</name><mfr>GrainCo</mfr>
      |<serving units=" cup">1</serving><calories total="110" fat="10"/>
      |<total-fat>2</total-fat><saturated-fat>0.5</saturated-fat>
      |<cholesterol>0</cholesterol><sodium>190</sodium>
      |<carb>22.5</carb><fiber>3</fiber><protein>4</protein>
      |<vitamins><a>25</a><c>2</c></vitamins>
      |<minerals><ca>10</ca><fe>45</fe></minerals></food>
      |<food><name>Berry Mix </name><mfr>FruitCo</mfr>
      |<serving units="g">40</serving><calories total="140" fat="0"/>
      |<total-fat>0</total-fat><saturated-fat>0</saturated-fat>
      |<cholesterol>0</cholesterol><sodium>5</sodium>
      |<carb>34</carb><fiber>2.5</fiber><protein>1</protein>
      |<vitamins><a>0</a><c>45</c></vitamins>
      |<minerals><ca>2</ca><fe>4</fe></minerals></food>
      |</nutrition>""".stripMargin.replace("\n", "")

  /** Pets parent table with surrogate keys (K2). */
  def pets(spark: SparkSession): DataFrame = {
    val src = spark.createDataFrame(Seq(Tuple1(petsJson))).toDF("payload")
    Shred.withSurrogateId(
      Shred.shredPets(src, "payload"), Seq(col("name")), "pet_id")
  }

  /** favfoods child table referencing the parent key (J4). */
  def petFavFoods(spark: SparkSession): DataFrame =
    Shred.childTable(pets(spark), "pet_id", col("fav_foods"), "food")

  /** All 7 daily-value metrics (`HW-2/init/init.sql:291-296` target). */
  val dailyMetrics: Seq[String] = Seq(
    "total-fat", "saturated-fat", "cholesterol", "sodium", "carb", "fiber",
    "protein")

  /** daily-values table: one row per metric element (F15: tag text +
    * units attribute).
    */
  def dailyValues(spark: SparkSession): DataFrame = {
    val src = spark.createDataFrame(Seq(Tuple1(nutritionXml))).toDF("xml")
    dailyMetrics.map { m =>
      src.select(
        lit(m).as("metric"),
        Shred.xmlString(col("xml"), s"nutrition/daily-values/$m/@units").as("units"),
        expr(s"xpath_double(xml, 'nutrition/daily-values/$m')").as("value"))
    }.reduce(_ unionByName _)
  }

  /** foods table: the full `nutrition_foods` field set
    * (`HW-2/init/init.sql:291-322`) — text fields, attribute-only
    * calories, the 7 flat nutrient elements, nested vitamins AND
    * minerals (F15/F17).
    */
  def foods(spark: SparkSession, maxFoods: Int = 10): DataFrame = {
    // xpath paths must be FOLDABLE literals, so positions are enumerated
    // at plan-build time (bounded fan-out, one narrow projection per
    // position) and empty positions filtered out.
    val src = spark.createDataFrame(Seq(Tuple1(nutritionXml))).toDF("xml")
    (1 to maxFoods).map { i =>
      val p = s"nutrition/food[$i]"
      def num(path: String, as: String) =
        expr(s"xpath_double(xml, '$p/$path')").as(as)
      src.select(
        trim(expr(s"xpath_string(xml, '$p/name')")).as("name"),
        expr(s"xpath_string(xml, '$p/mfr')").as("mfr"),
        expr(s"xpath_string(xml, '$p/serving')").as("serving"),
        expr(s"xpath_string(xml, '$p/serving/@units')").as("serving_units"),
        expr(s"xpath_int(xml, '$p/calories/@total')").as("calories_total"),
        expr(s"xpath_int(xml, '$p/calories/@fat')").as("calories_fat"),
        num("total-fat", "total_fat"),
        num("saturated-fat", "saturated_fat"),
        num("cholesterol", "cholesterol"),
        num("sodium", "sodium"),
        num("carb", "carb"),
        num("fiber", "fiber"),
        num("protein", "protein"),
        num("vitamins/a", "vitamin_a"),
        num("vitamins/c", "vitamin_c"),
        num("minerals/ca", "mineral_ca"),
        num("minerals/fe", "mineral_fe"))
    }.reduce(_ unionByName _)
      .filter(col("name") =!= "")
  }
}
