package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML → training-text extraction as pure column expressions (q158's
  * core, shared with TextMacroBench): script/style removal, anchor
  * sentinel marking, block-closing line breaks, tag strip, then the two
  * classic boilerplate heuristics per line — minimum real-token count
  * and link density. Everything stays in the Java-regex ∩ RE2 dialect
  * so a SQL oracle can replay it verbatim. An embarrassingly parallel
  * scan: no shuffle anywhere.
  */
object HtmlExtract {

  val MinTokens = 5
  /** drop a line when anchors are ≥ 1/LinkDensityDen of its tokens */
  val LinkDensityDen = 5

  /** Returns struct(n_links long, n_kept long, kept_text string). */
  def extract(html: Column): Column = {
    val noScript = regexp_replace(regexp_replace(html,
      "<script[^>]*>.*?</script>", ""), "<style[^>]*>.*?</style>", "")
    val marked = regexp_replace(noScript, "<a [^>]*>", " _A_ ")
    val withBreaks = regexp_replace(marked, "</(p|div|h1|nav|footer)>", "\n")
    val stripped = regexp_replace(withBreaks, "<[^>]+>", " ")
    val lineToks = transform(split(stripped, "\n"),
      l => filter(split(trim(regexp_replace(l, "\\s+", " ")), " "),
        tk => length(tk) > 0))
    val keptToks = filter(lineToks, ts => {
      val nl = size(filter(ts, tk => tk === "_A_"))
      (size(ts) - nl >= MinTokens) && (nl * LinkDensityDen <= size(ts))
    })
    val cleaned = transform(keptToks,
      ts => array_join(filter(ts, tk => tk =!= "_A_"), " "))
    val nLinks = ((length(marked) -
      length(regexp_replace(marked, "_A_", ""))) / 3).cast("long")
    struct(nLinks.as("n_links"),
      size(keptToks).cast("long").as("n_kept"),
      array_join(cleaned, " ").as("kept_text"))
  }
}
