package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** ISO-639 language-code table — the reference's `iso_639.pl`
  * (`iso_639_2/2, iso_639_3/2, iso_639/2` fact tables [V]) re-expressed
  * Spark-first: the table is a map LITERAL inside the plan
  * (`typedLit` + `element_at` — whole-stage codegen, broadcast-free,
  * no UDF), so lookups cost a hash probe per row and the DuckDB oracle
  * can interpolate the exact same pairs as SQL VALUES.
  *
  * Pragmatic subset of the upstream fact table: the ISO 639-1 two-letter
  * codes for widely-used languages plus their 639-2 three-letter aliases
  * (both bibliographic and terminological where they differ). Extending
  * it is data entry, not code.
  */
object Iso639 {

  /** code → English name (639-1 two-letter + common 639-2 aliases). */
  val names: Map[String, String] = {
    val base = Map(
      "ar" -> "Arabic", "bg" -> "Bulgarian", "bn" -> "Bengali",
      "ca" -> "Catalan", "cs" -> "Czech", "da" -> "Danish",
      "de" -> "German", "el" -> "Greek", "en" -> "English",
      "es" -> "Spanish", "et" -> "Estonian", "fa" -> "Persian",
      "fi" -> "Finnish", "fr" -> "French", "he" -> "Hebrew",
      "hi" -> "Hindi", "hr" -> "Croatian", "hu" -> "Hungarian",
      "id" -> "Indonesian", "it" -> "Italian", "ja" -> "Japanese",
      "ko" -> "Korean", "lt" -> "Lithuanian", "lv" -> "Latvian",
      "nl" -> "Dutch", "no" -> "Norwegian", "pl" -> "Polish",
      "pt" -> "Portuguese", "ro" -> "Romanian", "ru" -> "Russian",
      "sk" -> "Slovak", "sl" -> "Slovenian", "sr" -> "Serbian",
      "sv" -> "Swedish", "sw" -> "Swahili", "ta" -> "Tamil",
      "th" -> "Thai", "tr" -> "Turkish", "uk" -> "Ukrainian",
      "ur" -> "Urdu", "vi" -> "Vietnamese", "zh" -> "Chinese")
    val threeLetter = Map(
      "ara" -> "ar", "ben" -> "bn", "ces" -> "cs", "cze" -> "cs",
      "dan" -> "da", "deu" -> "de", "ger" -> "de", "ell" -> "el",
      "gre" -> "el", "eng" -> "en", "spa" -> "es", "fas" -> "fa",
      "per" -> "fa", "fin" -> "fi", "fra" -> "fr", "fre" -> "fr",
      "heb" -> "he", "hin" -> "hi", "hrv" -> "hr", "hun" -> "hu",
      "ind" -> "id", "ita" -> "it", "jpn" -> "ja", "kor" -> "ko",
      "nld" -> "nl", "dut" -> "nl", "nor" -> "no", "pol" -> "pl",
      "por" -> "pt", "ron" -> "ro", "rum" -> "ro", "rus" -> "ru",
      "slk" -> "sk", "slo" -> "sk", "slv" -> "sl", "srp" -> "sr",
      "swe" -> "sv", "swa" -> "sw", "tam" -> "ta", "tha" -> "th",
      "tur" -> "tr", "ukr" -> "uk", "urd" -> "ur", "vie" -> "vi",
      "zho" -> "zh", "chi" -> "zh")
    base ++ threeLetter.map { case (c3, c2) => c3 -> base(c2) }
  }

  /** iso_639/2 as a Column: code → name, null when unknown. Map literal
    * in the plan — codegen'd hash probe, no UDF, no join. */
  def nameOf(code: Column): Column =
    element_at(typedLit(names), lower(code))

  /** Membership test (`iso_639/2` succeeds). */
  def isKnown(code: Column): Column = nameOf(code).isNotNull
}
