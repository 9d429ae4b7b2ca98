package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions.{CosineSim, GopherStats, HyperplaneBands, LangIdScores, NfcNormalize, PandasFloatString, PointInPolygon, UnicodeTokens, WkbRingCoords}

/** SparkSessionExtensions entry point (SURVEY §7.3 extension surface):
  * registers graft's custom expressions into the SQL function registry so
  * plain `spark.sql` can call them. Activate with
  * `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.pandasFloatStr)
    ext.injectFunction(GraftExtensions.pointInPolygon)
    ext.injectFunction(GraftExtensions.hyperplaneBands)
    ext.injectFunction(GraftExtensions.cosineSim)
    ext.injectFunction(GraftExtensions.wkbRing)
    ext.injectFunction(GraftExtensions.gopherStats)
    ext.injectFunction(GraftExtensions.unicodeTokens)
    ext.injectFunction(GraftExtensions.nfcNormalize)
    ext.injectFunction(GraftExtensions.langIdScores)
    ext.injectOptimizerRule(_ => graft.plans.CollapseRedundantRound)
  }
}

object GraftExtensions {

  /** Register the same functions into an already-running session (the
    * extensions class covers `spark.sql.extensions` at session build).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    Seq(pandasFloatStr, pointInPolygon, hyperplaneBands, cosineSim,
      wkbRing, gopherStats, unicodeTokens, nfcNormalize, langIdScores)
      .foreach {
      case (ident, info, builder) =>
        spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }

  /** pandas_float_str(expr, scale): shortest pandas-style decimal string
    * of a double rounded to `scale` decimals.
    */
  val pandasFloatStr: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("pandas_float_str"),
    new ExpressionInfo(classOf[PandasFloatString].getName, "pandas_float_str"),
    (args: Seq[Expression]) => {
      require(args.length == 2, "pandas_float_str(value, scale)")
      val scale = args(1) match {
        case Literal(v: Int, _) => v
        case other => other.eval().asInstanceOf[Int]
      }
      PandasFloatString(args.head, scale)
    })

  /** point_in_polygon(px, py, xs, ys): exact even-odd ray-cast
    * containment over packed vertex arrays.
    */
  val pointInPolygon: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("point_in_polygon"),
    new ExpressionInfo(classOf[PointInPolygon].getName, "point_in_polygon"),
    (args: Seq[Expression]) => {
      require(args.length == 4, "point_in_polygon(px, py, xs, ys)")
      PointInPolygon(args(0), args(1), args(2), args(3))
    })

  /** cosine_sim(a, b): fused single-loop cosine similarity over two
    * numeric arrays (null on length mismatch).
    */
  val cosineSim: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("cosine_sim"),
    new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
    (args: Seq[Expression]) => {
      require(args.length == 2, "cosine_sim(a, b)")
      CosineSim(args(0), args(1))
    })

  /** wkb_ring(wkb, code): one coordinate axis of a WKB polygon ring —
    * code = axis (0 = x, 1 = y) + 2 * ringIndex.
    */
  val wkbRing: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("wkb_ring"),
    new ExpressionInfo(classOf[WkbRingCoords].getName, "wkb_ring"),
    (args: Seq[Expression]) => {
      require(args.length == 2, "wkb_ring(wkb, axis + 2*ring)")
      WkbRingCoords(args(0), args(1))
    })

  /** gopher_stats(tokens): all six Gopher repetition-rule outputs
    * (total/top-n/dup-n char coverage) as one struct, in a single
    * unboxed pass over a token array.
    */
  val gopherStats: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("gopher_stats"),
    new ExpressionInfo(classOf[GopherStats].getName, "gopher_stats"),
    (args: Seq[Expression]) => {
      require(args.length == 1, "gopher_stats(tokens)")
      GopherStats(args.head)
    })

  /** unicode_tokens(text): script-aware tokenization — CJK/Thai
    * codepoints as singleton tokens, whitespace-script runs split on
    * \s + U+3000 (functions/UnicodeTokens).
    */
  val unicodeTokens: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("unicode_tokens"),
    new ExpressionInfo(classOf[UnicodeTokens].getName, "unicode_tokens"),
    (args: Seq[Expression]) => {
      require(args.length == 1, "unicode_tokens(text)")
      UnicodeTokens(args.head)
    })

  /** nfc_normalize(text): Unicode NFC normalization
    * (functions/NfcNormalize) — the caller-side composition step the
    * tokenizer seam documents for decomposed kana / combining marks.
    */
  val nfcNormalize: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("nfc_normalize"),
    new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
    (args: Seq[Expression]) => {
      require(args.length == 1, "nfc_normalize(text)")
      NfcNormalize(args.head)
    })

  /** lang_id_scores(joined_tokens): (pred, scores) from the trained
    * language-ID artifact (operators/LangId.fixture) over a
    * space-joined token stream.
    */
  val langIdScores: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("lang_id_scores"),
    new ExpressionInfo(classOf[LangIdScores].getName, "lang_id_scores"),
    (args: Seq[Expression]) => {
      require(args.length == 1, "lang_id_scores(joined_tokens)")
      LangIdScores(args.head, graft.operators.LangId.fixture)
    })

  /** hyperplane_bands(vec, bands, bits): banded hyperplane-LSH
    * signatures (one packed long per band).
    */
  val hyperplaneBands: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("hyperplane_bands"),
    new ExpressionInfo(classOf[HyperplaneBands].getName, "hyperplane_bands"),
    (args: Seq[Expression]) => {
      require(args.length == 3, "hyperplane_bands(vec, bands, bits)")
      def int(e: Expression): Int = e match {
        case Literal(v: Int, _) => v
        case other => other.eval().asInstanceOf[Int]
      }
      HyperplaneBands(args.head, int(args(1)), int(args(2)))
    })
}
