package graft.store

import org.apache.spark.SparkConf

/** S3/MinIO configuration for the warehouse writer (SURVEY.md §2.1 S6) —
  * the Spark rendering of the reference's boto3 client setup
  * (`airflow/include/lib/s3_client.py:4-15`): endpoint override,
  * path-style addressing (MinIO requires it — no virtual-host buckets),
  * and static credentials from the same env vars.
  *
  * Hadoop's s3a connector reads these as `spark.hadoop.fs.s3a.*` conf
  * keys, so `PartitionedStore.upsertDaily(df, bucketPath(...))` writes the
  * identical hive `date=` layout to object storage with no code change —
  * the target path is the only difference. No MinIO exists in this
  * container, so the rendering (not the wire protocol) is what the unit
  * test pins.
  */
object S3Config {

  /** The `spark.hadoop.fs.s3a.*` settings for an endpoint-overridden
    * object store. `pathStyle` must stay true for MinIO. */
  def s3aSettings(endpoint: String, accessKey: String, secretKey: String,
      pathStyle: Boolean = true): Map[String, String] = Map(
    "spark.hadoop.fs.s3a.endpoint" -> endpoint,
    "spark.hadoop.fs.s3a.access.key" -> accessKey,
    "spark.hadoop.fs.s3a.secret.key" -> secretKey,
    "spark.hadoop.fs.s3a.path.style.access" -> pathStyle.toString,
    // plain-http endpoints (the reference's http://minio:9000) need SSL off
    "spark.hadoop.fs.s3a.connection.ssl.enabled" ->
      endpoint.startsWith("https").toString,
    // static credentials, matching the boto3 session_token-less client
    "spark.hadoop.fs.s3a.aws.credentials.provider" ->
      "org.apache.hadoop.fs.s3a.SimpleAWSCredentialsProvider")

  /** Reference env contract (`s3_client.py:5-8,15`): MINIO_ENDPOINT,
    * AWS_ACCESS_KEY_ID, AWS_SECRET_ACCESS_KEY, with the same defaults. */
  def fromEnv(env: Map[String, String] = sys.env): Map[String, String] =
    s3aSettings(
      env.getOrElse("MINIO_ENDPOINT", "http://minio:9000"),
      env.getOrElse("AWS_ACCESS_KEY_ID", "minio"),
      env.getOrElse("AWS_SECRET_ACCESS_KEY", "minio123"))

  /** Default bucket, `s3_client.py:15`. */
  def bucket(env: Map[String, String] = sys.env): String =
    env.getOrElse("MINIO_BUCKET", "portfolio-bucket")

  /** Warehouse root on the object store — the reference's
    * `s3://bucket/weather/...` key scheme under s3a. */
  def bucketPath(bucket: String, prefix: String): String =
    s"s3a://$bucket/$prefix"

  /** Apply the settings to a SparkConf (builder-style, pre-session). */
  def applyTo(conf: SparkConf, env: Map[String, String] = sys.env): SparkConf = {
    fromEnv(env).foreach { case (k, v) => conf.set(k, v) }
    conf
  }
}
