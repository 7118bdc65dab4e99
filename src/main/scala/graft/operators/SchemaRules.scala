package graft.operators

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSON-schema -> constraint-rule compiler.
  *
  * The reference validates its dataset against `schema.clinic.json`
  * with ajv (package.json "validate" script); here the same schema
  * document compiles into [[Validate.constraintReport]] rules, so a
  * schema change is a data change, not a code change.
  *
  * Draft-07 subset (everything schema.clinic.json uses, plus enum):
  *  - `required`            -> `<field>_required` null-violation rule
  *  - `minimum` / `maximum` -> `<field>_minimum` / `_maximum` rules
  *  - `enum`                -> `<field>_enum` membership rule
  *  - `minLength`/`maxLength`/`pattern` -> string-shape rules
  *  - `type`                -> STATIC column-type assertion via
  *    [[validateTypes]] — in a typed engine, ajv's per-row type errors
  *    are schema-level facts, checked once against the DataFrame
  *    schema rather than per row.
  *
  * Row-level rules guard with isNotNull (JSON-schema keywords other
  * than `type`/`required` vacuously pass on null), so nullability is
  * reported once by the `_required` rule, not double-counted.
  */
object SchemaRules {

  private def parse(schemaJson: String): JsonNode =
    new ObjectMapper().readTree(schemaJson)

  private def numLit(n: JsonNode): Column =
    if (n.isIntegralNumber) lit(n.asLong) else lit(n.asDouble)

  /** Compile the object-level schema into (ruleName, violation) pairs
    * for [[Validate.constraintReport]], deterministically ordered. */
  def compile(schemaJson: String): Seq[(String, Column)] = {
    val root = parse(schemaJson)
    val required = Option(root.get("required"))
      .map(_.elements().asScala.map(_.asText).toSet).getOrElse(Set.empty[String])
    val props = Option(root.get("properties"))
      .map(_.properties().asScala.toSeq).getOrElse(Seq.empty)

    props.flatMap { e =>
      val name = e.getKey; val spec = e.getValue
      val c = col(name)
      val rules = Seq.newBuilder[(String, Column)]
      if (required.contains(name))
        rules += s"${name}_required" -> c.isNull
      Option(spec.get("minimum")).foreach { m =>
        rules += s"${name}_minimum" -> (c.isNotNull && c < numLit(m))
      }
      Option(spec.get("maximum")).foreach { m =>
        rules += s"${name}_maximum" -> (c.isNotNull && c > numLit(m))
      }
      Option(spec.get("enum")).foreach { arr =>
        val vals = arr.elements().asScala.toSeq.filterNot(_.isNull).map { v =>
          if (v.isTextual) v.asText: Any
          else if (v.isIntegralNumber) v.asLong: Any
          else v.asDouble: Any
        }
        if (vals.nonEmpty)
          rules += s"${name}_enum" -> (c.isNotNull && !c.isin(vals: _*))
      }
      Option(spec.get("minLength")).foreach { m =>
        rules += s"${name}_min_length" -> (c.isNotNull && length(c) < lit(m.asInt))
      }
      Option(spec.get("maxLength")).foreach { m =>
        rules += s"${name}_max_length" -> (c.isNotNull && length(c) > lit(m.asInt))
      }
      Option(spec.get("pattern")).foreach { p =>
        rules += s"${name}_pattern" -> (c.isNotNull && !c.rlike(p.asText))
      }
      rules.result()
    }.sortBy(_._1)
  }

  private def typeMatches(jsonType: String, dt: DataType): Boolean = jsonType match {
    case "integer" => dt == ByteType || dt == ShortType || dt == IntegerType || dt == LongType
    case "number"  => dt.isInstanceOf[NumericType]
    case "string"  => dt == StringType
    case "boolean" => dt == BooleanType
    case "array"   => dt.isInstanceOf[ArrayType]
    case "object"  => dt.isInstanceOf[StructType] || dt.isInstanceOf[MapType]
    case "null"    => true
    case _         => true
  }

  /** Static type conformance: ajv's `type` checks, evaluated once
    * against the DataFrame schema. Returns human-readable mismatches
    * (empty = conformant). Honors `additionalProperties: false`. */
  def validateTypes(schemaJson: String, schema: StructType): Seq[String] = {
    val root = parse(schemaJson)
    val props = Option(root.get("properties"))
      .map(_.properties().asScala.toSeq).getOrElse(Seq.empty)
    val declared = props.map(_.getKey).toSet
    val noExtra = Option(root.get("additionalProperties")).exists(n => !n.asBoolean(true))

    val missingOrWrong = props.flatMap { e =>
      val name = e.getKey
      val types: Seq[String] = Option(e.getValue.get("type")).toSeq.flatMap { t =>
        if (t.isArray) t.elements().asScala.map(_.asText).toSeq else Seq(t.asText)
      }
      schema.fields.find(_.name == name) match {
        case None if Option(root.get("required"))
            .exists(_.elements().asScala.exists(_.asText == name)) =>
          Some(s"required column '$name' missing from DataFrame")
        case None => None
        case Some(f) if types.nonEmpty && !types.exists(typeMatches(_, f.dataType)) =>
          Some(s"column '$name': expected ${types.mkString("|")}, " +
            s"got ${f.dataType.simpleString}")
        case _ => None
      }
    }
    val extras =
      if (noExtra) schema.fieldNames.filterNot(declared.contains).toSeq
        .map(n => s"unexpected column '$n' (additionalProperties: false)")
      else Seq.empty
    missingOrWrong ++ extras
  }
}
