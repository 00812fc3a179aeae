package graft.io

import org.apache.spark.sql.SparkSession

/** S8 — cloud-session configuration (reference: labelspark
  * client.py:153-205 `get_spark_session`). The reference builds a
  * SparkSession wired for the Delta catalog plus GCS or S3A credentials,
  * keyed off the save-path scheme. In this zero-egress environment no
  * cloud endpoint is reachable, so the CONSTRUCTION is the testable
  * surface: a pure function from (savePath, config) to the exact conf
  * maps, validated the same way the reference validates its
  * `spark_config` dict — and a thin applier that lays them onto a
  * builder. Nothing here opens a connection.
  *
  * Layering mirrors where each key must land to take effect:
  *   - `builderConfs` must be set BEFORE session creation (jars,
  *     extensions, catalog — immutable once the JVM session exists);
  *   - `sessionConfs` are runtime SQL confs;
  *   - `hadoopConfs` go on `sparkContext.hadoopConfiguration` (filesystem
  *     impls and credentials, read by the FileSystem layer not SQL).
  */
object CloudSession {

  /** The reference's `spark_config` dict, typed. */
  final case class CloudConfig(
      jars: Seq[String] = Nil,
      gcsCredentialsKeyfile: Option[String] = None,
      awsAccessKey: Option[String] = None,
      awsSecretKey: Option[String] = None)

  /** The three conf layers for one target store. */
  final case class SessionConfs(
      builderConfs: Map[String, String],
      sessionConfs: Map[String, String],
      hadoopConfs: Map[String, String])

  private val deltaCore = Map(
    // client.py:167,190,203: every target gets the Delta engine wiring
    "spark.jars.packages" -> "io.delta:delta-core_2.12:2.2.0",
    "spark.sql.extensions" -> "io.delta.sql.DeltaSparkSessionExtension",
    "spark.sql.catalog.spark_catalog" ->
      "org.apache.spark.sql.delta.catalog.DeltaCatalog")

  /** Pure conf construction keyed off the save-path scheme — `gs://`
    * (client.py:154-176), `s3a:/` (client.py:178-199), anything else local
    * (client.py:201-205). Validation errors match the reference's.
    */
  def sessionConfs(savePath: String, cfg: CloudConfig = CloudConfig()): SessionConfs =
    if (savePath.startsWith("gs://")) {
      val keyfile = cfg.gcsCredentialsKeyfile.getOrElse(throw new IllegalArgumentException(
        "spark_config must contain a 'credentials' key to upload to GCS"))
      require(cfg.jars.nonEmpty,
        "spark_config must contain a 'jars' key containing the path to the " +
          "gcs-connector jar to connect to GCS")
      SessionConfs(
        builderConfs = deltaCore + ("spark.jars" -> cfg.jars.mkString(", ")),
        sessionConfs = Map(
          "spark.hadoop.fs.gs.auth.service.account.enable" -> "true",
          "google.cloud.auth.type" -> "SERVICE_ACCOUNT_JSON_KEYFILE",
          "google.cloud.auth.service.account.json.keyfile" -> keyfile,
          "spark.hadoop.fs.gs.impl" ->
            "com.google.cloud.hadoop.fs.gcs.GoogleHadoopFileSystem",
          "fs.AbstractFileSystem.gs.impl" ->
            "com.google.cloud.hadoop.fs.gcs.GoogleHadoopFileSystem",
          "spark.delta.logStore.gs.impl" -> "io.delta.storage.GCSLogStore",
          "spark.sql.catalog.spark_catalog" ->
            "org.apache.spark.sql.delta.catalog.DeltaCatalog",
          "spark.databricks.delta.defaults.columnMapping.mode" -> "name"),
        hadoopConfs = Map(
          "fs.gs.impl" -> "com.google.cloud.hadoop.fs.gcs.GoogleHadoopFileSystem"))
    } else if (savePath.startsWith("s3a:/")) {
      val access = cfg.awsAccessKey
      val secret = cfg.awsSecretKey
      if (access.isEmpty || secret.isEmpty) throw new IllegalArgumentException(
        "spark_config must contain 'AWS_ACCESS_KEY' and 'AWS_SECRET_KEY' as keys " +
          "to connect to S3")
      require(cfg.jars.nonEmpty,
        "spark_config must contain a 'jars' key with the paths to the hadoop-aws " +
          "and aws-java-sdk-bundle jars")
      SessionConfs(
        builderConfs = deltaCore + ("spark.jars" -> cfg.jars.mkString(", ")),
        sessionConfs = Map(
          "spark.delta.logStore.class" ->
            "org.apache.spark.sql.delta.storage.S3SingleDriverLogStore",
          "spark.databricks.delta.defaults.columnMapping.mode" -> "name"),
        hadoopConfs = Map(
          "fs.s3a.impl" -> "org.apache.hadoop.fs.s3a.S3AFileSystem",
          "fs.s3a.access.key" -> access.get,
          "fs.s3a.secret.key" -> secret.get))
    } else SessionConfs(
      builderConfs = deltaCore,
      sessionConfs = Map(
        "spark.databricks.delta.defaults.columnMapping.mode" -> "name"),
      hadoopConfs = Map.empty)

  /** Lay the pre-session layer onto a builder (the post-session layers
    * apply after getOrCreate — see [[applyRuntime]]). Pure wiring: does
    * not create the session.
    */
  def applyBuilder(builder: SparkSession.Builder, confs: SessionConfs): SparkSession.Builder = {
    confs.builderConfs.foreach { case (k, v) => builder.config(k, v) }
    builder.appName("graft_export")
  }

  /** Apply the runtime + hadoop layers to a live session. */
  def applyRuntime(spark: SparkSession, confs: SessionConfs): SparkSession = {
    confs.sessionConfs.foreach { case (k, v) => spark.conf.set(k, v) }
    confs.hadoopConfs.foreach { case (k, v) =>
      spark.sparkContext.hadoopConfiguration.set(k, v) }
    spark
  }
}
