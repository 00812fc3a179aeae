package graft.io

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** S8 conf construction is pure — these tests pin the exact keys each
  * cloud target needs and the reference's validation errors, with zero
  * egress.
  */
class CloudSessionSpec extends SparkSpec {
  import CloudSession._

  test("gs:// paths emit GCS credential, filesystem, and Delta log-store wiring") {
    val confs = sessionConfs("gs://proj/ds/folder", CloudConfig(
      jars = Seq("/jars/gcs-connector-hadoop2-latest.jar"),
      gcsCredentialsKeyfile = Some("/keys/svc.json")))
    assert(confs.builderConfs("spark.jars") == "/jars/gcs-connector-hadoop2-latest.jar")
    assert(confs.builderConfs("spark.sql.extensions")
      == "io.delta.sql.DeltaSparkSessionExtension")
    assert(confs.builderConfs("spark.sql.catalog.spark_catalog")
      == "org.apache.spark.sql.delta.catalog.DeltaCatalog")
    assert(confs.sessionConfs("google.cloud.auth.service.account.json.keyfile")
      == "/keys/svc.json")
    assert(confs.sessionConfs("google.cloud.auth.type") == "SERVICE_ACCOUNT_JSON_KEYFILE")
    assert(confs.sessionConfs("spark.hadoop.fs.gs.auth.service.account.enable") == "true")
    assert(confs.sessionConfs("spark.delta.logStore.gs.impl") == "io.delta.storage.GCSLogStore")
    assert(confs.hadoopConfs("fs.gs.impl")
      == "com.google.cloud.hadoop.fs.gcs.GoogleHadoopFileSystem")
  }

  test("s3a:/ paths emit S3A credentials on the hadoop layer and the S3 log store") {
    val confs = sessionConfs("s3a:/bucket/folder/table", CloudConfig(
      jars = Seq("/jars/hadoop-aws-3.3.4.jar", "/jars/aws-java-sdk-bundle-1.12.x.jar"),
      awsAccessKey = Some("AKIA123"), awsSecretKey = Some("s3cret")))
    assert(confs.builderConfs("spark.jars")
      == "/jars/hadoop-aws-3.3.4.jar, /jars/aws-java-sdk-bundle-1.12.x.jar")
    assert(confs.hadoopConfs("fs.s3a.impl") == "org.apache.hadoop.fs.s3a.S3AFileSystem")
    assert(confs.hadoopConfs("fs.s3a.access.key") == "AKIA123")
    assert(confs.hadoopConfs("fs.s3a.secret.key") == "s3cret")
    assert(confs.sessionConfs("spark.delta.logStore.class")
      == "org.apache.spark.sql.delta.storage.S3SingleDriverLogStore")
  }

  test("local paths get only the Delta engine wiring; validation matches the reference") {
    val local = sessionConfs("/tmp/local/table")
    assert(local.builderConfs.contains("spark.sql.extensions"))
    assert(!local.builderConfs.contains("spark.jars"))
    assert(local.hadoopConfs.isEmpty)

    val e1 = intercept[IllegalArgumentException] {
      sessionConfs("gs://p/d/f", CloudConfig(jars = Seq("x.jar")))
    }
    assert(e1.getMessage.contains("credentials"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      sessionConfs("gs://p/d/f", CloudConfig(gcsCredentialsKeyfile = Some("/k.json")))
    }
    assert(e2.getMessage.contains("jars"), e2.getMessage)
    val e3 = intercept[IllegalArgumentException] {
      sessionConfs("s3a:/b/f/t", CloudConfig(jars = Seq("x.jar"),
        awsAccessKey = Some("a")))
    }
    assert(e3.getMessage.contains("AWS_SECRET_KEY"), e3.getMessage)
  }

  test("runtime layer applies to a live session without touching pre-session keys") {
    val confs = sessionConfs("s3a:/b/f/t", CloudConfig(
      jars = Seq("x.jar"), awsAccessKey = Some("ak"), awsSecretKey = Some("sk")))
    val prevLs = spark.conf.getOption("spark.delta.logStore.class")
    val hc = spark.sparkContext.hadoopConfiguration
    val prevImpl = Option(hc.get("fs.s3a.access.key"))
    try {
      CloudSession.applyRuntime(spark, confs)
      assert(spark.conf.get("spark.delta.logStore.class")
        == "org.apache.spark.sql.delta.storage.S3SingleDriverLogStore")
      assert(hc.get("fs.s3a.access.key") == "ak")
    } finally {
      prevLs.fold(spark.conf.unset("spark.delta.logStore.class"))(
        spark.conf.set("spark.delta.logStore.class", _))
      prevImpl.fold(hc.unset("fs.s3a.access.key"))(hc.set("fs.s3a.access.key", _))
    }
  }
}
