package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.store.S3Config

/** S6's s3a rendering of the reference's MinIO client config
  * (`s3_client.py:4-15`) — no MinIO in the container, so the conf
  * rendering is the testable surface. */
class S3ConfigSpec extends AnyFunSuite {

  test("env contract and defaults mirror s3_client.py") {
    val conf = S3Config.fromEnv(Map.empty)
    assert(conf("spark.hadoop.fs.s3a.endpoint") === "http://minio:9000")
    assert(conf("spark.hadoop.fs.s3a.access.key") === "minio")
    assert(conf("spark.hadoop.fs.s3a.secret.key") === "minio123")
    assert(conf("spark.hadoop.fs.s3a.path.style.access") === "true")
    assert(conf("spark.hadoop.fs.s3a.connection.ssl.enabled") === "false")
    assert(S3Config.bucket(Map.empty) === "portfolio-bucket")
  }

  test("env overrides win; https endpoint turns SSL on") {
    val conf = S3Config.fromEnv(Map(
      "MINIO_ENDPOINT" -> "https://s3.example.com",
      "AWS_ACCESS_KEY_ID" -> "k",
      "AWS_SECRET_ACCESS_KEY" -> "s"))
    assert(conf("spark.hadoop.fs.s3a.endpoint") === "https://s3.example.com")
    assert(conf("spark.hadoop.fs.s3a.access.key") === "k")
    assert(conf("spark.hadoop.fs.s3a.connection.ssl.enabled") === "true")
  }

  test("bucketPath renders the reference's key scheme under s3a") {
    assert(S3Config.bucketPath("portfolio-bucket", "weather") ===
      "s3a://portfolio-bucket/weather")
  }

  test("applyTo lands every setting on a SparkConf") {
    val conf = S3Config.applyTo(new org.apache.spark.SparkConf(false), Map.empty)
    assert(conf.get("spark.hadoop.fs.s3a.endpoint") === "http://minio:9000")
    assert(conf.get("spark.hadoop.fs.s3a.path.style.access") === "true")
  }
}
