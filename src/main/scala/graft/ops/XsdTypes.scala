package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** XML-Schema primitive types: lexical validation + conversion + the
  * subtype hierarchy — the reference's `xsdp_types.pl`
  * (`xsdp_type/1, xsdp_subtype_of/2, xsdp_convert/3` [V]) re-expressed
  * Spark-first: validation is an anchored `rlike` (codegen'd, and the
  * regexes avoid lookarounds so the DuckDB oracle runs the SAME pattern
  * under RE2), conversion is `try_cast`-style — null on lexical failure,
  * never a task error (the reference fails the conversion goal; our rows
  * carry null).
  */
object XsdTypes {

  /** Lexical patterns per XSD primitive (anchored; RE2-compatible). */
  val patterns: Map[String, String] = Map(
    "string" -> "^[\\s\\S]*$",
    "normalizedString" -> "^[^\\t\\n\\r]*$",
    "token" -> "^(\\S+( \\S+)*)?$",
    "language" -> "^[a-zA-Z]{1,8}(-[a-zA-Z0-9]{1,8})*$",
    "NCName" -> "^[A-Za-z_][A-Za-z0-9._-]*$",
    "QName" -> "^([A-Za-z_][A-Za-z0-9._-]*:)?[A-Za-z_][A-Za-z0-9._-]*$",
    "boolean" -> "^(true|false|1|0)$",
    "integer" -> "^[+-]?[0-9]+$",
    "nonNegativeInteger" -> "^(\\+?[0-9]+|-0+)$",
    "positiveInteger" -> "^\\+?0*[1-9][0-9]*$",
    "long" -> "^[+-]?[0-9]+$",
    "int" -> "^[+-]?[0-9]+$",
    "short" -> "^[+-]?[0-9]+$",
    "byte" -> "^[+-]?[0-9]+$",
    "decimal" -> "^[+-]?([0-9]+(\\.[0-9]*)?|\\.[0-9]+)$",
    "float" -> "^([+-]?([0-9]+(\\.[0-9]*)?|\\.[0-9]+)([eE][+-]?[0-9]+)?|[+-]?INF|NaN)$",
    "double" -> "^([+-]?([0-9]+(\\.[0-9]*)?|\\.[0-9]+)([eE][+-]?[0-9]+)?|[+-]?INF|NaN)$",
    "date" -> "^-?[0-9]{4}[0-9]*-[0-9]{2}-[0-9]{2}(Z|[+-][0-9]{2}:[0-9]{2})?$",
    "time" -> "^[0-9]{2}:[0-9]{2}:[0-9]{2}(\\.[0-9]+)?(Z|[+-][0-9]{2}:[0-9]{2})?$",
    "dateTime" -> ("^-?[0-9]{4}[0-9]*-[0-9]{2}-[0-9]{2}" +
      "T[0-9]{2}:[0-9]{2}:[0-9]{2}(\\.[0-9]+)?(Z|[+-][0-9]{2}:[0-9]{2})?$"),
    "gYear" -> "^-?[0-9]{4}[0-9]*(Z|[+-][0-9]{2}:[0-9]{2})?$",
    "gYearMonth" -> "^-?[0-9]{4}[0-9]*-[0-9]{2}(Z|[+-][0-9]{2}:[0-9]{2})?$",
    "hexBinary" -> "^([0-9a-fA-F]{2})*$",
    "base64Binary" -> "^[A-Za-z0-9+/= \\t\\n\\r]*$",
    "anyURI" -> "^\\S*$")

  /** Primitive-type hierarchy (child → parent), per the XSD type tree the
    * reference encodes (`xsdp_types.pl — subtype facts` [V]). */
  val parent: Map[String, String] = Map(
    "normalizedString" -> "string",
    "token" -> "normalizedString",
    "language" -> "token",
    "NCName" -> "QName", // pragmatic: NCName lexically ⊂ QName
    "integer" -> "decimal",
    "nonNegativeInteger" -> "integer",
    "positiveInteger" -> "nonNegativeInteger",
    "long" -> "integer",
    "int" -> "long",
    "short" -> "int",
    "byte" -> "short")

  /** xsdp_subtype_of/2: reflexive-transitive walk of the hierarchy. */
  @annotation.tailrec
  def subtypeOf(t: String, ancestor: String): Boolean =
    t == ancestor || (parent.get(t) match {
      case Some(p) => subtypeOf(p, ancestor)
      case None => false
    })

  /** Lexical validation column: anchored regex match (codegen). */
  def validate(c: Column, xsdType: String): Column =
    patterns.get(xsdType) match {
      case Some(p) => c.isNotNull && c.rlike(p)
      case None => lit(false)
    }

  /** Conversion column: validated lexical form → typed value, null
    * otherwise (xsdp_convert/3 analogue; graceful, never an error). */
  def convert(c: Column, xsdType: String): Column = xsdType match {
    case "boolean" =>
      when(c.isin("true", "1"), lit(true))
        .when(c.isin("false", "0"), lit(false))
    case "integer" | "long" | "int" | "short" | "byte" |
         "nonNegativeInteger" | "positiveInteger" =>
      // leading '+' stripped for cast parity across engines
      when(validate(c, xsdType), regexp_replace(c, "^\\+", "").cast("long"))
    case "decimal" | "float" | "double" =>
      when(validate(c, xsdType), c.cast("double"))
    case "date" => to_date(c, "yyyy-MM-dd")
    case "dateTime" => to_timestamp(c)
    case "gYear" =>
      when(validate(c, "gYear"), substring(c, 1, 4).cast("long"))
    case _ => when(validate(c, xsdType), c) // string family: identity
  }
}
