package graft.functions

/** Shared text-shingling / hashing expression builders for the D/F
  * operator families. Both sides of each pair (Spark SQL expr string,
  * DuckDB SQL string) are kept adjacent so the semantics stay mirrored:
  * 1-based element access (element_at / duck list indexing), md5-hex
  * lexicographic minima (engine-neutral — no integer hash available in
  * both engines), guarded empty shingle lists (Spark's sequence(1,0)
  * would count DOWN, DuckDB's generate_series(1,0) is empty).
  */
object TextFns {

  /** whitespace tokens */
  val toksSpark = "split(text, ' ')"
  val toksDuck = "string_split(text, ' ')"

  /** distinct 3-gram word shingles.
    * Built from three aligned slices zipped together instead of
    * per-index element_at: Spark higher-order lambdas are interpreted
    * (not codegen'd) and re-evaluate captured expressions per element,
    * so an element_at(split(text), i) formulation costs O(tokens²)
    * splits per document — this one does 3 slices + 2 zips. */
  val shSpark: String =
    "CASE WHEN size(split(text, ' ')) >= 3 THEN " +
      "array_distinct(zip_with(" +
      "zip_with(slice(split(text, ' '), 1, size(split(text, ' ')) - 2), " +
      "slice(split(text, ' '), 2, size(split(text, ' ')) - 2), (a, b) -> concat(a, ' ', b)), " +
      "slice(split(text, ' '), 3, size(split(text, ' ')) - 2), (ab, c) -> concat(ab, ' ', c))) " +
      "ELSE array() END"

  val shDuck: String =
    "list_distinct(list_transform(generate_series(1, GREATEST(len(string_split(text, ' ')) - 2, 0)), " +
      "i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i + 1] || ' ' || string_split(text, ' ')[i + 2]))"

  /** normalized text (lowercase, collapsed whitespace, trimmed) */
  val normSpark = "trim(regexp_replace(lower(text), ' +', ' '))"
  val normDuck = "trim(regexp_replace(lower(text), ' +', ' ', 'g'))"

  /** language stopword membership sets (n-gram-heuristic lang id) */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "es" -> Seq("el", "la", "de", "y", "es"),
    "fr" -> Seq("le", "la", "et", "les", "des"))

  def hitsSpark(lang: String): String = {
    val set = stopwords(lang).map(w => s"'$w'").mkString(", ")
    s"size(filter(split(text, ' '), t -> t IN ($set)))"
  }

  def hitsDuck(lang: String): String = {
    val set = stopwords(lang).map(w => s"'$w'").mkString(", ")
    s"len(list_filter(string_split(text, ' '), t -> t IN ($set)))"
  }
}
