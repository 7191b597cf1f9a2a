package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Semi-structured shredding: JSON blobs and XML documents → relational
  * columns.
  *
  * Reference:
  *  - S3/F13 JSON shredding: `HW-2/airflow/dags/sources_to_linear.py:22-33,
  *    46-70` — `payload["pets"]`, per-pet field access, favFoods array.
  *  - S4/F15 XML shredding: `HW-2/airflow/dags/sources_to_linear.py:82-167`
  *    — child text, attributes, nested vitamin/mineral groups.
  *
  * Spark mapping (SURVEY.md §2.8): `from_json` with an explicit schema for
  * JSON (schema-on-read stays columnar and codegen'd); the built-in
  * `xpath_string`/`xpath_int` expressions for XML — no custom UDF needed,
  * both are native Catalyst expressions that pipeline inside the scan
  * stage with no shuffle.
  */
object Shred {

  /** Pets-payload schema (FIXTURES.md §A1; `HW-2/init/init.sql:12-38`). */
  val petsSchema: StructType = StructType(Seq(
    StructField("pets", ArrayType(StructType(Seq(
      StructField("name", StringType),
      StructField("species", StringType),
      StructField("favFoods", ArrayType(StringType)),
      StructField("birthYear", IntegerType),
      StructField("photo", StringType)))))))

  /** Companion schema for the F14 scalar-or-array coercion: the same
    * array position parsed with favFoods as TEXT. A scalar value
    * ("fish" or 42) lands here as its string form while the typed
    * schema yields NULL; an actual array lands as raw JSON text but is
    * ignored because the typed parse won.
    */
  private val petsScalarSchema: StructType = StructType(Seq(
    StructField("pets", ArrayType(StructType(Seq(
      StructField("favFoods", StringType)))))))

  /** Parse a JSON string column with an explicit schema (never infer —
    * reproduces the reference's declared-DDL semantics, SURVEY.md §1.2).
    */
  def parseJson(c: Column, schema: DataType): Column = from_json(c, schema)

  /** Extract a scalar JSON field as a typed column. */
  def jsonInt(c: Column, path: String): Column =
    get_json_object(c, path).cast("int")

  /** XPath text extraction over an XML string column (F15). Each
    * `xpath_*` call RE-PARSES the whole blob — fine for a one-off
    * extraction, wrong for wide shreds: use [[parseXml]] there.
    */
  def xmlString(c: Column, path: String): Column = xpath_string(c, lit(path))

  /** XPath numeric extraction (F15/F17 `num()` helper equivalent). */
  def xmlInt(c: Column, path: String): Column = xpath_int(c, lit(path))

  /** SINGLE-PARSE XML shredding (F15 at scale): `from_xml` with an
    * explicit schema parses the blob once per row into a struct —
    * versus one full DOM re-parse per `xpath_*` call (q13 was 3
    * parses/row, the foods shred 170: 10 positions × 17 fields).
    * Attributes surface under the default `_` prefix, element text of
    * an attributed element under `_VALUE`; repeated child elements map
    * to an `ArrayType` field, which replaces positional `food[i]`
    * xpath enumeration with one `explode`.
    *
    * `ignoreSurroundingSpaces` is pinned FALSE (Spark's XML default
    * trims character data and attribute values) so string extractions
    * stay verbatim like `xpath_string` — callers trim explicitly where
    * the target semantics want it.
    */
  def parseXml(c: Column, schema: StructType): Column = {
    import scala.jdk.CollectionConverters._
    from_xml(c, schema,
      Map("ignoreSurroundingSpaces" -> "false").asJava)
  }

  /** Shred `pets` JSON into the flat child table: one row per pet with
    * the favFoods array coerced from scalar when needed (F14).
    *
    * Scalar-or-array coercion (`HW-2/airflow/dags/sources_to_linear.py:
    * 55-57`: `if not isinstance(favs, list): favs = [str(favs)]`): the
    * payload is parsed TWICE — typed (array favFoods) and all-text
    * (string favFoods) — and the two pet arrays zipped by position, so a
    * scalar value becomes a one-element array instead of silently
    * parsing to NULL. Two fixed parses per payload row (not one per
    * pet), both codegen'd, still shuffle-free.
    */
  def shredPets(df: DataFrame, payloadCol: String): DataFrame =
    df.select(explode(arrays_zip(
        parseJson(col(payloadCol), petsSchema).getField("pets").as("typed"),
        parseJson(col(payloadCol), petsScalarSchema).getField("pets").as("raw"))).as("z"))
      .select(
        col("z.typed.name").as("name"),
        col("z.typed.species").as("species"),
        col("z.typed.birthYear").as("birth_year"),
        col("z.typed.photo").as("photo"),
        coalesce(col("z.typed.favFoods"),
          when(col("z.raw.favFoods").isNotNull, array(col("z.raw.favFoods"))))
          .as("fav_foods"))

  /** K2: deterministic contiguous surrogate key (`INSERT ... RETURNING id`
    * equivalent, `HW-2/airflow/dags/sources_to_linear.py:59-79`). The
    * unpartitioned window is intentional and documented: correct for
    * mart/dimension-sized parents (≤ millions); for fact-scale frames use
    * `withUniqueId` (non-contiguous, fully parallel) instead.
    */
  def withSurrogateId(df: DataFrame, order: Seq[Column], idCol: String): DataFrame =
    df.withColumn(idCol,
      row_number().over(org.apache.spark.sql.expressions.Window.orderBy(order: _*))
        .cast("long"))

  /** K2 at scale: unique (non-contiguous) 64-bit id, no shuffle at all. */
  def withUniqueId(df: DataFrame, idCol: String): DataFrame =
    df.withColumn(idCol, monotonically_increasing_id())

  /** J4: FK child table from a parent array column — one row per element
    * referencing the parent's key (pets → pet_favfoods,
    * `HW-2/init/init.sql:284-288`). Generate node: pipelined, no shuffle.
    */
  def childTable(parent: DataFrame, idCol: String, arr: Column, as: String): DataFrame =
    parent.select(col(idCol), explode(arr).as(as))
}
