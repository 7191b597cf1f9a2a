package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
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
  * All extraction is native expressions (`from_json`, `from_xml`) — the
  * shred stage pipelines inside the scan with no shuffle and each blob
  * is parsed ONCE per row; only the surrogate-id window (mart-sized
  * parent, SURVEY §7.4 trap 4) sorts.
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

  /** An attributed numeric element (`<m units="g">65</m>`): the units
    * attribute under the default `_` prefix, the text under `_VALUE`.
    */
  private val metricSchema: StructType = StructType(Seq(
    StructField("_units", StringType), StructField("_VALUE", DoubleType)))

  /** daily-values table: one row per metric element (F15: tag text +
    * units attribute). ONE `from_xml` parse per document — the seven
    * metric rows come from exploding an in-plan struct array over the
    * parsed result, not from seven per-metric xpath re-parses.
    */
  def dailyValues(spark: SparkSession): DataFrame = {
    val src = spark.createDataFrame(Seq(Tuple1(nutritionXml))).toDF("xml")
    val schema = StructType(Seq(StructField("daily-values",
      StructType(dailyMetrics.map(m => StructField(m, metricSchema))))))
    src
      .select(Shred.parseXml(col("xml"), schema)
        .getField("daily-values").as("dv"))
      .select(explode(array(dailyMetrics.map { m =>
        struct(
          lit(m).as("metric"),
          col("dv").getField(m).getField("_units").as("units"),
          col("dv").getField(m).getField("_VALUE").as("value"))
      }: _*)).as("r"))
      .select(col("r.metric"), col("r.units"), col("r.value"))
  }

  /** One `<food>` element: text fields, a mixed attribute+text serving,
    * attribute-only calories, the 7 flat nutrient elements, and the
    * nested vitamin/mineral groups.
    */
  private val foodSchema: StructType = StructType(Seq(
    StructField("name", StringType),
    StructField("mfr", StringType),
    StructField("serving", StructType(Seq(
      StructField("_units", StringType), StructField("_VALUE", StringType)))),
    StructField("calories", StructType(Seq(
      StructField("_total", IntegerType), StructField("_fat", IntegerType)))),
    StructField("total-fat", DoubleType),
    StructField("saturated-fat", DoubleType),
    StructField("cholesterol", DoubleType),
    StructField("sodium", DoubleType),
    StructField("carb", DoubleType),
    StructField("fiber", DoubleType),
    StructField("protein", DoubleType),
    StructField("vitamins", StructType(Seq(
      StructField("a", DoubleType), StructField("c", DoubleType)))),
    StructField("minerals", StructType(Seq(
      StructField("ca", DoubleType), StructField("fe", DoubleType))))))

  /** foods table: the full `nutrition_foods` field set
    * (`HW-2/init/init.sql:291-322`) — F15/F17. The repeated `<food>`
    * elements map to ONE ArrayType field of one `from_xml` parse, then
    * explode — replacing the old positional `food[i]` enumeration
    * (10 positions × 17 xpath calls = 170 DOM re-parses per document)
    * with exactly one parse and no position cap at all.
    */
  def foods(spark: SparkSession): DataFrame = {
    val src = spark.createDataFrame(Seq(Tuple1(nutritionXml))).toDF("xml")
    val schema = StructType(Seq(StructField("food", ArrayType(foodSchema))))
    src
      .select(explode(Shred.parseXml(col("xml"), schema)
        .getField("food")).as("f"))
      .select(
        trim(col("f.name")).as("name"),
        col("f.mfr").as("mfr"),
        col("f.serving").getField("_VALUE").as("serving"),
        col("f.serving").getField("_units").as("serving_units"),
        col("f.calories").getField("_total").as("calories_total"),
        col("f.calories").getField("_fat").as("calories_fat"),
        col("f").getField("total-fat").as("total_fat"),
        col("f").getField("saturated-fat").as("saturated_fat"),
        col("f.cholesterol").as("cholesterol"),
        col("f.sodium").as("sodium"),
        col("f.carb").as("carb"),
        col("f.fiber").as("fiber"),
        col("f.protein").as("protein"),
        col("f.vitamins.a").as("vitamin_a"),
        col("f.vitamins.c").as("vitamin_c"),
        col("f.minerals.ca").as("mineral_ca"),
        col("f.minerals.fe").as("mineral_fe"))
  }
}
