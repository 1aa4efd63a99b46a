package graft

import java.nio.file.Files

import graft.engine.CsvToParquet

/** CSV→Parquet conversion invariants: all-string schema-on-read, value
  * preservation, single-file output (csv-to-parquet.py semantics).
  */
class CsvToParquetSpec extends SparkTestBase {

  test("round-trip preserves values verbatim as strings (seeded property, 20 samples)") {
    val rnd = new scala.util.Random(11)
    val tmp = Files.createTempDirectory("graft-c2p").toString
    for (i <- 1 to 20) {
      // values that tempt inference: ints, decimals, dates, currency, empties
      val pool = Seq("12", "12.5", "N/A", "", "2015-01-07", "1/7/2015",
        "$1,234.56", "true", "0012", "-3", "text with space")
      val rows = Seq.fill(1 + rnd.nextInt(5))(
        (pool(rnd.nextInt(pool.size)), pool(rnd.nextInt(pool.size))))
      val csv = "A,B\n" + rows.map { case (a, b) =>
        def q(v: String) = if (v.contains(",") || v.contains(" ")) s""""$v"""" else v
        s"${q(a)},${q(b)}"
      }.mkString("\n")
      val src = s"$tmp/in_$i.csv"
      Files.writeString(java.nio.file.Paths.get(src), csv)
      CsvToParquet.run(spark, src, s"$tmp/out_$i")

      val back = spark.read.parquet(s"$tmp/out_$i")
      assert(back.schema.fields.forall(_.dataType.typeName == "string"),
        s"sample $i inferred a non-string type")
      val got = back.collect()
        .map(r => (Option(r.getString(0)).getOrElse(""), Option(r.getString(1)).getOrElse("")))
        .sorted.toSeq
      assert(got == rows.sorted, s"sample $i: $got != ${rows.sorted}")
      // coalesce(1): exactly one data file
      val files = new java.io.File(s"$tmp/out_$i").listFiles()
        .filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1)
    }
  }
}
