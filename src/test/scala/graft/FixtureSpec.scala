package graft

import graft.api.Client
import graft.core.payload.UploadBuilder
import graft.io.{Sources, UploadTransport}
import org.apache.spark.sql.functions._

import java.util.concurrent.ConcurrentLinkedQueue

/** End-to-end replications of the reference's five fixture pipelines
  * (SURVEY §5: each demo notebook pairs a CSV with one entry point) against
  * the ACTUAL reference fixture CSVs at /root/reference/datasets (read-only
  * input data, not code). Payload assertions mirror the upload-dict contract
  * from uploader.py:143-153.
  */
class FixtureSpec extends SparkSpec {

  private val fixtures = "/root/reference/datasets"

  private def runImport(csv: String): (Seq[String], Client.ImportResult) = {
    val df = Sources.readCsv(spark, s"$fixtures/$csv")
    val sent = new ConcurrentLinkedQueue[String]()
    val transport = new UploadTransport {
      def send(batch: Seq[String]): Int = { batch.foreach(sent.add); batch.size }
    }
    val res = Client.createDataRowsFromTable(
      df, UploadBuilder.Config(datasetId = Some("ds-fixture")), transport)
    (sent.toArray.map(_.toString).toSeq, res)
  }

  test("urls.csv — plain data-row import (intro.ipynb flow)") {
    val (payloads, res) = runImport("urls.csv")
    assert(res.accepted == 10L && payloads.size == 10)
    payloads.foreach { p =>
      assert(p.contains(""""row_data":"https://"""") || p.contains(""""row_data":"http"""))
      assert(p.contains(""""global_key":"labelspark-urls-test-"""))
      assert(p.contains(""""dataset_id":"ds-fixture""""))
    }
  }

  test("metadata.csv — metadata index import") {
    val (payloads, res) = runImport("metadata.csv")
    assert(res.accepted == 10L)
    // every payload carries all four metadata kinds' fields
    payloads.foreach { p =>
      Seq("labelspark-String", "labelspark-Number", "labelspark-Enum", "labelspark-Datetime")
        .foreach(k => assert(p.contains(s""""schema_id":"$k""""), s"missing $k in $p"))
    }
  }

  test("attachments.csv — attachment index import") {
    val (payloads, res) = runImport("attachments.csv")
    assert(res.accepted == 10L)
    payloads.foreach { p =>
      Seq("image", "video", "text_url", "raw_text", "html")
        .foreach(t => assert(p.contains(s""""type":"$t""""), s"missing $t"))
    }
  }

  test("annotations.csv — annotation ndjson build (annotations.ipynb flow)") {
    val (_, res) = runImport("annotations.csv")
    assert(res.accepted == 3L)
    val nd = res.ndjson.collect()
    val byKind = nd.groupBy(_.kind).view.mapValues(_.length).toMap
    // 3 data rows × {bbox×2 variants, polygon×2, mask, point, line,
    // radio×2, checklist, text} — every kind appears
    Seq("bbox", "polygon", "mask", "point", "line", "radio", "checklist", "text")
      .foreach(k => assert(byKind.getOrElse(k, 0) > 0, s"no $k ndjson"))
    // geometry structure sanity
    assert(nd.filter(_.kind == "bbox").forall(_.geometry.startsWith("""{"bbox":{""")))
    assert(nd.filter(_.kind == "polygon").forall(_.geometry.startsWith("""{"polygon":[""")))
    // nested classifications survive
    assert(nd.exists(_.classifications.nonEmpty))
  }

  test("mask methods: png passes through, url emits instanceURI, array encodes a real PNG") {
    import graft.core.payload.NdjsonKernel
    // png: the cell carries the png string (the existing fixture form)
    val png = NdjsonKernel.cellToNdjsons("gk1", "mask", "seg",
      "[[['iVBORw0KGgo=', [255, 0, 0]], []]]", maskMethod = "png")
    assert(png.map(_.geometry) ==
      Seq("""{"mask":{"png":"iVBORw0KGgo=","colorRGB":[255,0,0]}}"""))
    // url: the same cell shape, first element read as an accessible URL
    val url = NdjsonKernel.cellToNdjsons("gk1", "mask", "seg",
      "[[['https://x.test/m.png', [0, 255, 0]], []]]", maskMethod = "url")
    assert(url.map(_.geometry) ==
      Seq("""{"mask":{"instanceURI":"https://x.test/m.png","colorRGB":[0,255,0]}}"""))
    // array: a raster → a REAL grayscale png (decode it back and check
    // dimensions + pixels round-trip)
    val arr = NdjsonKernel.cellToNdjsons("gk1", "mask", "seg",
      "[[[[[0, 255, 0], [255, 0, 255]], [0, 0, 255]], []]]", maskMethod = "array")
    assert(arr.size == 1)
    val geomJson = arr.head.geometry
    assert(geomJson.contains(""""colorRGB":[0,0,255]"""), geomJson)
    val b64 = geomJson.split("\"png\":\"")(1).split("\"")(0)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(java.util.Base64.getDecoder.decode(b64)))
    assert(img.getWidth == 3 && img.getHeight == 2)
    assert(img.getRaster.getSample(0, 0, 0) == 0)
    assert(img.getRaster.getSample(1, 0, 0) == 255)
    assert(img.getRaster.getSample(2, 1, 0) == 255)
    // url/array require a color; unknown methods are rejected
    intercept[IllegalArgumentException] {
      NdjsonKernel.cellToNdjsons("gk", "mask", "seg",
        "[[['https://x.test/m.png', 'null'], []]]", maskMethod = "url")
    }
    intercept[IllegalArgumentException] {
      NdjsonKernel.cellToNdjsons("gk", "mask", "seg",
        "[[['x', [1,2,3]], []]]", maskMethod = "nope")
    }
    // the distributed kernel honors the method end-to-end
    import spark.implicits._
    implicit val s = spark
    val df = Seq(("gk9", "mask", "seg", "[[['https://y.test/m.png', [9, 9, 9]], []]]"))
      .toDF("global_key", "tool_type", "name", "cell")
    val out = NdjsonKernel.explodeAnnotations(df, maskMethod = "url").collect()
    assert(out.head.geometry.contains("instanceURI"), out.head.geometry)
  }

  test("full-import.csv — the whole payload builder at once (full-demo.ipynb flow)") {
    val (payloads, res) = runImport("full-import.csv")
    assert(res.accepted == 3L)
    payloads.foreach { p =>
      assert(p.contains(""""metadata_fields":["""))
      assert(p.contains(""""attachments":["""))
      assert(p.contains(""""annotations":["""))
    }
    assert(res.ndjson.count() > 0)
  }
}
