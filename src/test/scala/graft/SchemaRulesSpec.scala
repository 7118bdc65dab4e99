package graft

import org.apache.spark.sql.types._
import graft.operators.{RefDemos, SchemaRules, Validate}

class SchemaRulesSpec extends SparkSpec {
  import spark.implicits._

  private val schema =
    """{
      |  "type": "object",
      |  "required": ["name", "n"],
      |  "properties": {
      |    "name": { "type": "string", "minLength": 2, "pattern": "^[a-z]+$" },
      |    "n":    { "type": "integer", "minimum": 0, "maximum": 10 },
      |    "kind": { "type": ["string", "null"], "enum": ["a", "b", null] }
      |  },
      |  "additionalProperties": false
      |}""".stripMargin

  test("A10b compiled rules count violations per keyword, nulls not double-counted") {
    val df = Seq(
      (Some("ok"), Some(5), Some("a")),     // clean
      (None, Some(-1), Some("z")),          // name_required, n_minimum, kind_enum
      (Some("X"), Some(99), None),          // name_min_length + name_pattern, n_maximum
      (Some("yy"), None, Some("b"))         // n_required only
    ).toDF("name", "n", "kind")
    val out = Validate.constraintReport(df, SchemaRules.compile(schema))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map(
      "name_required" -> 1, "name_min_length" -> 1, "name_pattern" -> 1,
      "n_required" -> 1, "n_minimum" -> 1, "n_maximum" -> 1,
      "kind_enum" -> 1))
  }

  test("A10b static type validation catches wrong types, missing and extra columns") {
    val good = StructType(Seq(StructField("name", StringType),
      StructField("n", LongType), StructField("kind", StringType)))
    assert(SchemaRules.validateTypes(schema, good).isEmpty)

    val wrong = StructType(Seq(StructField("name", IntegerType),
      StructField("n", LongType)))
    val errs = SchemaRules.validateTypes(schema, wrong)
    assert(errs.exists(_.contains("column 'name': expected string")))
    // 'kind' is nullable-optional and not required: absence is fine
    assert(!errs.exists(_.contains("'kind'")))

    val missing = StructType(Seq(StructField("name", StringType)))
    assert(SchemaRules.validateTypes(schema, missing)
      .exists(_.contains("required column 'n' missing")))

    val extra = StructType(good.fields :+ StructField("stray", StringType))
    assert(SchemaRules.validateTypes(schema, extra)
      .exists(_.contains("unexpected column 'stray'")))
  }

  test("A10b the clinic schema document compiles and validates the demo frame") {
    val out = RefDemos.schemaValidate(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.keySet == Set(
      "address_required", "county_required", "has_quota_required",
      "in_4_weeks_minimum", "in_4_weeks_required", "org_name_required",
      "source_enum", "this_week_minimum"))
    assert(out("county_required") > 0 && out("source_enum") > 0)
    assert(out("address_required") == 0 && out("has_quota_required") == 0)
  }
}
