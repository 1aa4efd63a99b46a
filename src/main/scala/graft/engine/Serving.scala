package graft.engine

import java.util.Properties

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Serving-layer sinks and object-store utilities — the engine mapping of
  * the reference DAG's fan-out after the curated write (SURVEY §3.3).
  *
  *  - S5 catalog table: the Glue-crawler → Athena path
  *    (etl_aws_vini.py:559-573) becomes `saveAsTable` on the session
  *    catalog + a SQL count — the crawler's schema inference is the
  *    catalog's own parquet schema discovery.
  *  - S6 JDBC sink: the Postgres load (etl_aws_vini.py:307-335) does
  *    pandas `to_sql(if_exists='replace')` — a FULL-REPLACE overwrite,
  *    not an append; `jdbcOverwrite` preserves exactly that.
  *  - S7 warehouse DDL pin: [[SchemaDdl.conform]] before either sink.
  *  - S9 object-store listing: the S3 wildcard key sensing + prefix
  *    listing (etl_aws_vini.py:459-476) via Hadoop `globStatus`; the
  *    Postgres branch loads the LAST key of the listing
  *    (etl_aws_vini.py:328) — modeled deterministically as max-by-name.
  */
object Serving {

  // ---- S5: session-catalog table (Glue/Athena stand-in) ----------------

  def saveCatalogTable(df: DataFrame, table: String): Unit =
    df.write.mode(SaveMode.Overwrite).format("parquet").saveAsTable(table)

  /** `SELECT count(*)` validation query (etl_aws_vini.py:244-249). */
  def catalogCount(spark: SparkSession, table: String): Long =
    spark.sql(s"SELECT count(*) FROM $table").head().getLong(0)

  // ---- S6: JDBC full-replace sink (Postgres stand-in) ------------------

  def jdbcOverwrite(df: DataFrame, url: String, table: String,
      props: Properties = new Properties()): Unit =
    df.write.mode(SaveMode.Overwrite).jdbc(url, table, props)

  /** `SELECT count(*) as qt` validation (etl_aws_vini.py:251-256). */
  def jdbcCount(spark: SparkSession, url: String, table: String,
      props: Properties = new Properties()): Long =
    spark.read.jdbc(url, table, props).count()

  // ---- S9: object-store listing / key sensing --------------------------

  /** Paths matching a glob pattern — the S3 wildcard key-sensing analog
    * (the DAG polls `data/AdventureWorks` for csv keys,
    * etl_aws_vini.py:459-468).
    */
  def listKeys(spark: SparkSession, pattern: String): Seq[String] = {
    val p = new Path(pattern)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    Option(fs.globStatus(p)).map(_.toSeq.map(_.getPath.toString)).getOrElse(Seq.empty)
  }

  def keyExists(spark: SparkSession, pattern: String): Boolean =
    listKeys(spark, pattern).nonEmpty

  /** The reference's `parquet_list[-1]` (etl_aws_vini.py:328) pinned
    * deterministic: lexicographic max of the listing.
    */
  def latestKey(spark: SparkSession, pattern: String): Option[String] = {
    val keys = listKeys(spark, pattern)
    if (keys.isEmpty) None else Some(keys.max)
  }
}
