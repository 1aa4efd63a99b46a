package graft.engine

import java.io.{BufferedInputStream, FileOutputStream, InputStream}
import java.nio.file.{Files, Path, Paths}
import java.util.zip.ZipInputStream

/** S8: the landing-zone ingest utility — the engine-side analog of the
  * reference's Lambda (k8s/lambda-function/lambda_function.py:9-30),
  * which GETs a zip archive and re-uploads each entry under a `data/`
  * prefix of the landing bucket.
  *
  * This is deliberately NOT a query operator (SURVEY §2.1 S8): it is
  * plain-JVM plumbing that runs before Spark sees anything. The HTTP GET
  * side is a caller-provided InputStream (zero-egress environments test
  * with a file stream); the unzip-and-land step is exact.
  */
object ZipIngest {

  /** Unpack every entry of `zip` under `landingDir/data/` (the lambda's
    * `data/` prefix), returning the landed paths. Directory entries and
    * dot-entries ("."/"..") are skipped; nested entry paths are
    * flattened to their file name, as the lambda's `file.filename`
    * upload does — entries sharing a basename land last-writer-wins,
    * matching the S3 re-upload. Entry names are sanitized to their
    * basename, so a hostile archive cannot traverse outside
    * `landingDir`.
    */
  def unzipToLanding(zip: InputStream, landingDir: String): Seq[String] = {
    val dataDir = Paths.get(landingDir, "data")
    Files.createDirectories(dataDir)
    val in = new ZipInputStream(new BufferedInputStream(zip))
    val landed = Seq.newBuilder[String]
    try {
      var entry = in.getNextEntry
      while (entry != null) {
        // basename sanitization alone passes "." and ".." through
        // (Paths.get("a/..").getFileName is ".."), which would resolve to
        // a directory and abort the ingest — skip such entries outright
        val base = Option(Paths.get(entry.getName).getFileName).map(_.toString)
        if (!entry.isDirectory && base.exists(b => b != "." && b != "..")) {
          val name = base.get
          val target: Path = dataDir.resolve(name)
          val out = new FileOutputStream(target.toFile)
          try {
            val buf = new Array[Byte](64 * 1024)
            var n = in.read(buf)
            while (n >= 0) {
              out.write(buf, 0, n)
              n = in.read(buf)
            }
          } finally out.close()
          landed += target.toString
        }
        in.closeEntry()
        entry = in.getNextEntry
      }
    } finally in.close()
    landed.result()
  }
}
