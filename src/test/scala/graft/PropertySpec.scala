package graft

import graft.core.payload.NdjsonKernel
import graft.core.schema.{ColumnSpec, ColumnValidator, SchemaFlattener}
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property-based invariants for the pure (session-free) kernels:
  * name-convention parsing, schema flattening, and the python-literal
  * parser. (SURVEY §5 test strategy, item 2.)
  */
object GraftProperties extends Properties("graft") {

  private val ident: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString).suchThat(_.nonEmpty)

  // ------------------------------------------------------- ColumnSpec

  property("ColumnSpec parse inverts rendering") =
    forAll(ident, ident, ident) { (k, t, n) =>
      val raw = s"$k///$t///$n"
      ColumnSpec.parse(raw).contains(ColumnSpec(k, t, n, raw))
    }

  property("ColumnSpec rejects non-3-part names") =
    forAll(ident) { s => ColumnSpec.parse(s).isEmpty }

  property("validator resolves annotations in column order") =
    forAll(Gen.listOf(ident.map(n => s"annotation///bbox///$n"))) { anns =>
      val rc = ColumnValidator.validate("row_data" +: anns).toOption.get
      rc.annotations.map(_.raw) == anns.distinct ||
        rc.annotations.map(_.raw) == anns // duplicates allowed, order kept
    }

  // --------------------------------------------------- SchemaFlattener

  private val leafType: Gen[DataType] =
    Gen.oneOf(StringType, LongType, DoubleType, BooleanType)

  private def genStruct(depth: Int): Gen[StructType] =
    for {
      n <- Gen.choose(1, 4)
      names <- Gen.listOfN(n, ident).map(_.distinct).suchThat(_.nonEmpty)
      fields <- Gen.sequence[List[StructField], StructField](names.map { nm =>
        genDataType(depth - 1).map(dt => StructField(nm, dt))
      })
    } yield StructType(fields)

  private def genDataType(depth: Int): Gen[DataType] =
    if (depth <= 0) leafType
    else Gen.frequency(
      4 -> leafType,
      2 -> genStruct(depth),
      1 -> genStruct(depth).map(ArrayType(_)),
      1 -> leafType.map(ArrayType(_)))

  property("leafPaths are unique, non-empty for non-empty schemas, and descend structs") =
    forAll(genStruct(3)) { schema =>
      val paths = SchemaFlattener.leafPaths(schema)
      paths.nonEmpty && paths.distinct == paths &&
        paths.forall(p => p.split('.').head.nonEmpty)
    }

  property("leafPaths cross at most one array of structs") =
    forAll(genStruct(3)) { schema =>
      // resolve each path manually, counting array crossings
      def walk(dt: DataType, parts: List[String], arrays: Int): Boolean = (dt, parts) match {
        case (_, Nil) => true
        case (s: StructType, h :: t) =>
          s.find(_.name == h).exists(f => walk(f.dataType, t, arrays))
        case (ArrayType(e: StructType, _), parts) =>
          arrays == 0 && walk(e, parts, 1)
        case _ => false
      }
      SchemaFlattener.leafPaths(schema).forall { p =>
        walk(schema, p.split('.').toList, 0)
      }
    }

  // ------------------------------------------------- PyLiteral parser

  private def render(v: Any): String = v match {
    case l: List[_] => l.map(render).mkString("[", ", ", "]")
    case s: String => "'" + s + "'"
    case d: Double => d.toString
    case other => other.toString
  }

  private val pyLeaf: Gen[Any] = Gen.oneOf(
    Gen.choose(-1000000L, 1000000L),
    Gen.choose(-1e6, 1e6).suchThat(d => !d.isWhole), // whole doubles render as ints
    ident)

  private def pyValue(depth: Int): Gen[Any] =
    if (depth <= 0) pyLeaf
    else Gen.frequency(
      3 -> pyLeaf,
      2 -> Gen.listOf(pyValue(depth - 1)).map(_.take(4)))

  property("parsePyLiteral inverts rendering") =
    forAll(pyValue(3)) { v =>
      NdjsonKernel.parsePyLiteral(render(v)) == v
    }

  property("nested classification chains split on the first divider") =
    forAll(ident, Gen.nonEmptyListOf(ident)) { (q, rest) =>
      val s = (q +: rest).mkString("///")
      val sc = NdjsonKernel.parseNested(s)
      sc.question == q && sc.answer == rest.mkString("///")
    }

  // ------------------------------------------------------ ndjson validity

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** Any char content — including quotes, backslashes, and control chars
    * (the \r\t\u00XX escaping class) — but not '[', which switches the cell
    * parser into list mode.
    */
  private val cellContent: Gen[String] =
    Gen.listOf(Gen.oneOf(
      Gen.alphaNumChar, Gen.oneOf('"', '\\', '\n', '\r', '\t', '', '', 'é')))
      .map(_.mkString).suchThat(s => !s.startsWith("[") && s.nonEmpty)

  property("text-annotation ndjson is valid JSON for any cell content") =
    forAll(cellContent) { content =>
      NdjsonKernel.cellToNdjsons("gk", "text", "n", content).forall { a =>
        val parsed = mapper.readTree(a.geometry) // throws on invalid JSON
        parsed.path("text_answer").path("content").asText() == content
      }
    }

  // ------------------------------------------------------- bit interleave

  /** Morton interleave must be invertible: extracting even/odd bits of the
    * z-value recovers each dimension exactly (locality claims rest on it).
    */
  property("z-order interleave round-trips both 16-bit inputs") =
    forAll(Gen.choose(0, 65535), Gen.choose(0, 65535)) { (x, y) =>
      var z = 0L
      (0 until 16).foreach { i =>
        z |= ((x.toLong >> i) & 1L) << (2 * i)
        z |= ((y.toLong >> i) & 1L) << (2 * i + 1)
      }
      var rx = 0; var ry = 0
      (0 until 16).foreach { i =>
        rx |= (((z >> (2 * i)) & 1L) << i).toInt
        ry |= (((z >> (2 * i + 1)) & 1L) << i).toInt
      }
      rx == x && ry == y
    }

  // --------------------------------------------------- incremental monoid

  private case class S(n: Long, sum: Double, mn: Double, mx: Double)
  private def partial(xs: List[Double]): S =
    S(xs.length.toLong, xs.sum, if (xs.isEmpty) Double.NaN else xs.min,
      if (xs.isEmpty) Double.NaN else xs.max)
  private def comb(a: S, b: S): S =
    if (a.n == 0) b else if (b.n == 0) a
    else S(a.n + b.n, a.sum + b.sum, math.min(a.mn, b.mn), math.max(a.mx, b.mx))

  /** The state Incremental.merge carries must be a commutative monoid for
    * refresh order not to matter: any grouping/order of deltas gives the
    * full recompute (sum compared with tolerance — double addition).
    */
  property("incremental agg state combines associatively and commutatively") =
    forAll(Gen.listOf(Gen.choose(-1e6, 1e6)), Gen.listOf(Gen.choose(-1e6, 1e6)),
      Gen.listOf(Gen.choose(-1e6, 1e6))) { (xs, ys, zs) =>
      val all = partial(xs ++ ys ++ zs)
      val left = comb(comb(partial(xs), partial(ys)), partial(zs))
      val right = comb(partial(xs), comb(partial(ys), partial(zs)))
      val swapped = comb(partial(ys), comb(partial(zs), partial(xs)))
      def eq(a: S, b: S) = a.n == b.n &&
        (a.n == 0 || (math.abs(a.sum - b.sum) <= 1e-6 * math.max(1.0, math.abs(a.sum))
          && a.mn == b.mn && a.mx == b.mx))
      eq(left, all) && eq(right, all) && eq(swapped, all)
    }
}
