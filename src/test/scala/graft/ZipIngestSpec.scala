package graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.file.{Files, Paths}
import java.util.zip.{ZipEntry, ZipOutputStream}

import graft.engine.{CsvToParquet, ZipIngest}

/** S8: zip ingest lands entries under data/, then the CSV scan reads
  * them with reference options — the full landing-zone round trip.
  */
class ZipIngestSpec extends SparkTestBase {

  private def makeZip(entries: (String, String)*): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val z = new ZipOutputStream(bos)
    entries.foreach { case (name, content) =>
      z.putNextEntry(new ZipEntry(name))
      z.write(content.getBytes("UTF-8"))
      z.closeEntry()
    }
    z.close()
    bos.toByteArray
  }

  test("unzip lands each entry under data/ and the CSV scan reads it all-string") {
    val tmp = Files.createTempDirectory("graft-landing").toString
    val zip = makeZip(
      "AdventureWorks/AdventureWorks_Mini.csv" -> "K,V\n1,a\n2,b\n",
      "readme.txt" -> "not csv")
    val landed = ZipIngest.unzipToLanding(new ByteArrayInputStream(zip), tmp)
    assert(landed.length == 2)
    assert(landed.forall(_.startsWith(s"$tmp/data/")))

    val df = CsvToParquet.readCsvAllString(spark, s"$tmp/data/AdventureWorks_Mini.csv")
    assert(df.columns.toSeq == Seq("K", "V"))
    assert(df.schema.fields.forall(_.dataType.typeName == "string")) // no inferSchema
    assert(df.count() == 2)
  }

  test("hostile entry names cannot escape the landing dir") {
    val tmp = Files.createTempDirectory("graft-landing2").toString
    val zip = makeZip("../../evil.txt" -> "x")
    val landed = ZipIngest.unzipToLanding(new ByteArrayInputStream(zip), tmp)
    assert(landed == Seq(s"$tmp/data/evil.txt"))
    assert(!Files.exists(Paths.get(tmp).getParent.resolve("evil.txt")))
  }

  test("dot entries are skipped instead of aborting the ingest") {
    val tmp = Files.createTempDirectory("graft-landing3").toString
    val zip = makeZip(
      ".." -> "x",          // basename '..' resolves to a directory
      "x/.." -> "y",
      "ok.txt" -> "fine")
    val landed = ZipIngest.unzipToLanding(new ByteArrayInputStream(zip), tmp)
    assert(landed == Seq(s"$tmp/data/ok.txt"))
  }
}
