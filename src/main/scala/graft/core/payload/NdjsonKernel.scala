package graft.core.payload

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** The annotation-ndjson kernel (SURVEY §2.7 U4 / §7.4 hard part 1): parse
  * the reference's annotation cell syntax into one ndjson-style record per
  * annotation instance.
  *
  * Cell syntax (reconstructed from the fixture CSVs,
  * /root/reference/datasets/annotations.csv:1 and FIXTURES.md — the actual
  * builder lives in the un-vendored labelbase package, so only call-site
  * behavior is normative): a Python-literal nested list
  * `[[geometry, [nested classification strings]], ...]`, where nested
  * classifications are "question///answer" chains; radio/checklist/text
  * cells carry the answer directly.
  *
  * Geometry layouts per tool kind:
  *   bbox     [left, top, width, height]
  *   polygon  [[x1,y1], [x2,y2], ...]
  *   point    [x, y]
  *   line     [[x1,y1], [x2,y2], ...]
  *   mask     [png_bytes_string, [r, g, b]]
  *
  * The kernel is a typed Dataset flatMap (a Generator in Spark terms): the
  * parse runs distributed on executors, one pass, no driver iteration — the
  * reference runs it inside chained Python UDFs (uploader.py:186-195).
  */
object NdjsonKernel {

  final case class SubClassification(question: String, answer: String)

  /** One ndjson annotation record. `geometry` is a compact JSON string. */
  final case class AnnotationNdjson(
      global_key: String,
      name: String,
      kind: String,
      geometry: String,
      classifications: Seq[SubClassification])

  // ------------------------------------------------------------ parser

  /** Minimal Python-literal parser: lists, ints, floats, single/double
    * quoted strings. Returns List[Any] | Long | Double | String.
    */
  def parsePyLiteral(s: String): Any = {
    val p = new PyParser(s)
    val v = p.parseValue()
    p.skipWs()
    require(p.eof, s"trailing characters at ${p.pos} in: $s")
    v
  }

  private final class PyParser(s: String) {
    var pos = 0
    def eof: Boolean = pos >= s.length
    def skipWs(): Unit = while (!eof && (s(pos) == ' ' || s(pos) == '\t' ||
      s(pos) == '\n' || s(pos) == ',')) pos += 1

    def parseValue(): Any = {
      skipWs()
      require(!eof, s"unexpected end of input in: $s")
      s(pos) match {
        case '[' => parseList()
        case '\'' | '"' => parseString()
        case _ => parseNumber()
      }
    }

    private def parseList(): List[Any] = {
      pos += 1 // [
      val buf = scala.collection.mutable.ListBuffer.empty[Any]
      skipWs()
      while (!eof && s(pos) != ']') {
        buf += parseValue()
        skipWs()
      }
      require(!eof, s"unterminated list in: $s")
      pos += 1 // ]
      buf.toList
    }

    private def parseString(): String = {
      val quote = s(pos)
      pos += 1
      val sb = new StringBuilder
      while (!eof && s(pos) != quote) {
        if (s(pos) == '\\' && pos + 1 < s.length) { sb += s(pos + 1); pos += 2 }
        else { sb += s(pos); pos += 1 }
      }
      require(!eof, s"unterminated string in: $s")
      pos += 1
      sb.toString
    }

    private def parseNumber(): Any = {
      val start = pos
      while (!eof && (s(pos).isDigit || "+-.eE".contains(s(pos)))) pos += 1
      val tok = s.substring(start, pos)
      require(tok.nonEmpty, s"expected a value at $start in: $s")
      if (tok.exists(c => c == '.' || c == 'e' || c == 'E')) tok.toDouble else tok.toLong
    }
  }

  // ------------------------------------------------------ ndjson build

  private def num(v: Any): String = v match {
    case d: Double if d.isWhole => d.toLong.toString
    case d: Double => d.toString
    case l: Long => l.toString
    case other => other.toString
  }

  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < 0x20 => f"\\u${c.toInt}%04x" // all remaining control chars
      case c => c.toString
    } + "\""

  private def pointJson(p: Any): String = p match {
    case List(x, y) => s"""{"x":${num(x)},"y":${num(y)}}"""
    case other => throw new IllegalArgumentException(s"expected [x,y], got $other")
  }

  /** The reference's three mask input formats (client.py:49-52,
    * uploader.py:65-68): "png" = the cell carries a png string; "url" = the
    * cell carries an accessible URL (color required); "array" = the cell
    * carries a raster (list of rows of pixel values — the numpy form;
    * color required), which we encode to a real grayscale PNG via
    * javax.imageio on the executor.
    */
  val MaskMethods: Set[String] = Set("png", "url", "array")

  /** Geometry JSON for one instance of `kind`. `maskMethod` selects how a
    * mask cell's first element is interpreted; non-mask kinds ignore it.
    */
  def geometryJson(kind: String, geom: Any, maskMethod: String = "png"): String =
    (kind, geom) match {
    case ("bbox", List(l, t, w, h)) =>
      s"""{"bbox":{"left":${num(l)},"top":${num(t)},"width":${num(w)},"height":${num(h)}}}"""
    case ("polygon", pts: List[_]) =>
      s"""{"polygon":[${pts.map(pointJson).mkString(",")}]}"""
    case ("line", pts: List[_]) =>
      s"""{"line":[${pts.map(pointJson).mkString(",")}]}"""
    case ("point", List(x, y)) =>
      s"""{"point":{"x":${num(x)},"y":${num(y)}}}"""
    case ("mask", List(payload, color)) =>
      require(MaskMethods.contains(maskMethod),
        s"mask_method must be one of ${MaskMethods.mkString(", ")}, got $maskMethod")
      def colorJson: Option[String] = color match {
        case List(r, g, b) => Some(s"""[${num(r)},${num(g)},${num(b)}]""")
        case _ => None // fixture encodes "no color" as the string 'null'
      }
      (maskMethod, payload) match {
        case ("png", png: String) =>
          val c = colorJson.map(c => s""","colorRGB":$c""").getOrElse("")
          s"""{"mask":{"png":${jsonStr(png)}$c}}"""
        case ("url", url: String) =>
          val c = colorJson.getOrElse(throw new IllegalArgumentException(
            "mask_method=url requires a [r,g,b] color"))
          s"""{"mask":{"instanceURI":${jsonStr(url)},"colorRGB":$c}}"""
        case ("array", rows: List[_]) =>
          val c = colorJson.getOrElse(throw new IllegalArgumentException(
            "mask_method=array requires a [r,g,b] color"))
          s"""{"mask":{"png":${jsonStr(pngFromArray(rows))},"colorRGB":$c}}"""
        case (m, p) => throw new IllegalArgumentException(
          s"mask_method=$m cannot interpret a ${p.getClass.getSimpleName} mask cell")
      }
    case other =>
      throw new IllegalArgumentException(s"unsupported geometry for $other")
  }

  /** Raster rows (list of rows of integral pixel values, the numpy-array
    * mask form) → base64 of a real grayscale PNG. Deterministic: pixel
    * values clamp to [0, 255]; every row must share the first row's width.
    */
  def pngFromArray(rows: List[_]): String = {
    require(rows.nonEmpty, "array mask must have at least one row")
    val grid = rows.map {
      case r: List[_] => r.map(v => num(v).toDouble.toInt)
      case other => throw new IllegalArgumentException(
        s"array mask rows must be lists, got $other")
    }
    val w = grid.head.length
    require(w > 0 && grid.forall(_.length == w),
      s"array mask rows must be non-empty and rectangular (width $w)")
    val img = new java.awt.image.BufferedImage(
      w, grid.length, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    grid.zipWithIndex.foreach { case (row, y) =>
      row.zipWithIndex.foreach { case (v, x) =>
        raster.setSample(x, y, 0, math.max(0, math.min(255, v)))
      }
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    java.util.Base64.getEncoder.encodeToString(out.toByteArray)
  }

  /** "q///a" (or "branch///subq///suba" chains) → SubClassification. */
  def parseNested(s: String, divider: String = "///"): SubClassification = {
    val parts = s.split(java.util.regex.Pattern.quote(divider), -1)
    require(parts.length >= 2, s"nested classification needs kind${divider}answer: $s")
    SubClassification(parts.head, parts.tail.mkString(divider))
  }

  private val GeometryKinds = Set("bbox", "polygon", "point", "line", "mask")

  /** Parse one annotation cell into its ndjson records. */
  def cellToNdjsons(globalKey: String, kind: String, name: String,
      cell: String, maskMethod: String = "png"): Seq[AnnotationNdjson] = {
    if (cell == null || cell.isEmpty) return Seq.empty
    if (GeometryKinds.contains(kind)) {
      parsePyLiteral(cell) match {
        case instances: List[_] => instances.map {
          case List(geom, nested: List[_]) =>
            AnnotationNdjson(globalKey, name, kind, geometryJson(kind, geom, maskMethod),
              nested.map(n => parseNested(n.toString)))
          case other => throw new IllegalArgumentException(
            s"expected [geometry, [nested...]], got $other")
        }
        case other => throw new IllegalArgumentException(s"expected a list of instances, got $other")
      }
    } else {
      // Classification cells arrive as [[answers...], ...] in the fixtures
      // (one inner list per instance); tolerate a flat list (one instance)
      // or a bare string.
      val parsed: Any = if (cell.startsWith("[")) parsePyLiteral(cell) else cell
      val instances: List[List[String]] = parsed match {
        case l: List[_] if l.nonEmpty && l.forall(_.isInstanceOf[List[_]]) =>
          l.map(_.asInstanceOf[List[_]].map(_.toString))
        case l: List[_] => List(l.map(_.toString))
        case s => List(List(s.toString))
      }
      kind match {
        case "radio" =>
          // Each answer string may be a branch chain:
          // "answer" | "branch///sub_question///sub_answer[///...]".
          instances.flatMap(_.map { chainStr =>
            val parts = chainStr.split("///")
            val nested = parts.drop(1).grouped(2).collect {
              case Array(q, a) => SubClassification(q, a)
            }.toSeq
            AnnotationNdjson(globalKey, name, kind,
              s"""{"radio_answer":{"name":${jsonStr(parts.head)}}}""", nested)
          })
        case "checklist" =>
          instances.map { answers =>
            AnnotationNdjson(globalKey, name, kind,
              s"""{"checklist_answers":[${answers.map(a => s"""{"name":${jsonStr(a)}}""").mkString(",")}]}""",
              Seq.empty)
          }
        case "text" =>
          instances.flatMap(_.map { content =>
            AnnotationNdjson(globalKey, name, kind,
              s"""{"text_answer":{"content":${jsonStr(content)}}}""", Seq.empty)
          })
        case other =>
          throw new IllegalArgumentException(s"unknown annotation kind: $other")
      }
    }
  }

  /** Distributed kernel: explode the uploads' annotation cells into ndjson
    * records. Input needs columns (global_key, tool_type, name, cell) — the
    * shape UploadBuilder.annotationCells produces.
    */
  def explodeAnnotations(df: DataFrame, maskMethod: String = "png")(
      implicit spark: SparkSession): Dataset[AnnotationNdjson] = {
    require(MaskMethods.contains(maskMethod),
      s"mask_method must be one of ${MaskMethods.mkString(", ")}, got $maskMethod")
    import spark.implicits._
    df.select(
        col("global_key").cast("string"),
        col("tool_type").cast("string"),
        col("name").cast("string"),
        col("cell").cast("string"))
      .as[(String, String, String, String)]
      .flatMap { case (gk, kind, name, cell) =>
        cellToNdjsons(gk, kind, name, cell, maskMethod) }
  }
}
