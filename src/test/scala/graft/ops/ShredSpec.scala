package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ShredSpec extends SparkSpec {
  import spark.implicits._

  private val payload =
    """{"pets":[
      |{"name":"Rex","species":"dog","favFoods":["beef","chicken"],"birthYear":2019,"photo":"rex.png"},
      |{"name":"Mia","species":"cat","birthYear":2021,"photo":"mia.png"}
      |]}""".stripMargin.replace("\n", "")

  test("shredPets explodes array-of-structs with optional array field") {
    val out = Shred.shredPets(Seq(payload).toDF("payload"), "payload")
      .orderBy("name").collect()
    assert(out.length == 2)
    assert(out(1).getAs[String]("name") == "Rex")
    assert(out(1).getSeq[String](out(1).fieldIndex("fav_foods")).toList ==
      List("beef", "chicken"))
    assert(out(0).getAs[Any]("fav_foods") == null) // Mia has no favFoods
  }

  test("shredPets coerces scalar favFoods to a one-element array (F14)") {
    // string scalar, numeric scalar, HTML-ish scalar — the reference's
    // `if not isinstance(favs, list): favs = [str(favs)]`
    val p =
      """{"pets":[
        |{"name":"Tom","species":"cat","favFoods":"tuna","birthYear":2018,"photo":"t.png"},
        |{"name":"Kiwi","species":"bird","favFoods":42,"birthYear":2023,"photo":"k.png"},
        |{"name":"Zoe","species":"parrot","favFoods":"<strong>any</strong> food","birthYear":2020,"photo":"z.png"}
        |]}""".stripMargin.replace("\n", "")
    val out = Shred.shredPets(Seq(p).toDF("payload"), "payload")
      .orderBy("name").collect()
      .map(r => r.getAs[String]("name") ->
        r.getSeq[String](r.fieldIndex("fav_foods")).toList).toMap
    assert(out("Tom") == List("tuna"))
    assert(out("Kiwi") == List("42"))
    assert(out("Zoe") == List("<strong>any</strong> food"))
  }

  test("jsonInt extracts typed scalar from JSON string") {
    val out = Seq("""{"k": 42}""", """{"x": 1}""").toDF("j")
      .select(Shred.jsonInt(col("j"), "$.k").as("k")).collect()
    assert(Option(out(0).get(0)).contains(42) && out(1).isNullAt(0))
  }

  test("xml extraction: child text, nested path, numeric attr handling") {
    val xml = "<food><name>Oat</name><cal total=\"110\"/><vitamins><a>25</a></vitamins></food>"
    val df = Seq(xml).toDF("x")
    val out = df.select(
      Shred.xmlString(col("x"), "food/name").as("n"),
      Shred.xmlInt(col("x"), "food/vitamins/a").as("va"),
      Shred.xmlString(col("x"), "food/cal/@total").as("cal")).collect()(0)
    assert(out.getString(0) == "Oat")
    assert(out.getInt(1) == 25)
    assert(out.getString(2) == "110")
  }
}
