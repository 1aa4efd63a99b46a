package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** S7: the authoritative curated output schema — the Redshift DDL the
  * reference creates before COPYing the curated parquet
  * (k8s/dags/etl_aws_vini.py:205-242), restated as a StructType.
  *
  * The warehouse is the schema authority in the reference architecture:
  * the curated query's casts (variables.py:26-60) were written to line up
  * with this DDL, and the COPY would fail on drift. [[conform]] is the
  * engine-side equivalent of that contract: cast + reorder the curated
  * DataFrame to exactly these 34 columns.
  */
object SchemaDdl {

  private val dec10 = DecimalType(10, 2)

  /** 34 columns, order and types per etl_aws_vini.py:205-242. */
  val curatedSchema: StructType = StructType(Seq(
    StructField("OrderDate", DateType),
    StructField("StockDate", DateType),
    StructField("CustomerKey", IntegerType),
    StructField("TerritoryKey", IntegerType),
    StructField("OrderLineItem", IntegerType),
    StructField("OrderQuantity", IntegerType),
    StructField("Prefix", StringType),
    StructField("FirstName", StringType),
    StructField("LastName", StringType),
    StructField("BirthDate", DateType),
    StructField("MaritalStatus", StringType),
    StructField("Gender", StringType),
    StructField("EmailAddress", StringType),
    StructField("AnnualIncome", dec10),
    StructField("TotalChildren", IntegerType),
    StructField("EducationLevel", StringType),
    StructField("Occupation", StringType),
    StructField("HomeOwner", StringType),
    StructField("ProductKey", IntegerType),
    StructField("ProductSubcategoryKey", IntegerType),
    StructField("SubcategoryName", StringType),
    StructField("ProductCategoryKey", IntegerType),
    StructField("CategoryName", StringType),
    StructField("ProductSKU", StringType),
    StructField("ProductName", StringType),
    StructField("ModelName", StringType),
    StructField("ProductDescription", StringType),
    StructField("ProductColor", StringType),
    StructField("ProductSize", IntegerType),
    StructField("ProductStyle", StringType),
    StructField("ProductCost", dec10),
    StructField("ProductPrice", dec10),
    StructField("ReturnDate", DateType),
    StructField("ReturnQuantity", IntegerType)))

  /** Cast + reorder `df` to the DDL schema (lenient casts — session has
    * ansi off — so drift surfaces as NULLs, like Redshift COPY would
    * surface as load errors).
    */
  def conform(df: DataFrame): DataFrame =
    df.select(curatedSchema.fields.map(f => col(f.name).cast(f.dataType).as(f.name)).toSeq: _*)
}
