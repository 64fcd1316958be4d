package graft

import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.time.LocalDate

import graft.runner.JobRunner
import graft.sources.{Dbf, FileTransport}
import graft.spec.Specs._

/** S7 transport: server-spec resolution (file + ftp), date-templated
  * filenames, and an end-to-end ftp extract against a hermetic loopback
  * FTP server driven through Hadoop's FTPFileSystem.
  */
class TransportSpec extends SparkSpec {

  val date = LocalDate.of(2024, 1, 15)

  test("file transport joins the server root and substitutes date macros") {
    val srv = FileServerSpec(protocol = "file", rootPath = "/data/drops/")
    assert(FileTransport.resolve(spark, srv, "ext_{aaaa}{mm}{dd}.csv", date)
      == "/data/drops/ext_20240115.csv")
    // reference %(x)s spelling (cubicerpetl.py:825)
    assert(FileTransport.resolve(spark, srv, "ext_%(aa)s%(mm)s.csv", date)
      == "/data/drops/ext_2401.csv")
  }

  test("ftp uri embeds credentials, root, and the substituted name") {
    val srv = FileServerSpec(protocol = "ftp", rootPath = "drops",
      host = "ftp.example.test", port = 2121, user = "etl", password = "pw")
    assert(FileTransport.remoteUri(srv, "ext_{aaaa}{mm}{dd}.txt", date)
      == "ftp://etl:pw@ftp.example.test:2121/drops/ext_20240115.txt")
    intercept[IllegalArgumentException] {
      FileTransport.remoteUri(srv.copy(password = "p@w"), "x", date)
    }
  }

  test("ftp transport stages and reads a csv end-to-end (Hadoop FTPFileSystem)") {
    val root = Files.createTempDirectory(java.nio.file.Paths.get(graft.Scratch.root), "graft_ftp")
    Files.createDirectories(root.resolve("drops"))
    Files.write(root.resolve("drops/ext_20240115.csv"),
      "k,v\n1,alpha\n2,beta\n".getBytes(StandardCharsets.UTF_8))
    val ftpd = new MiniFtpServer(root, "etl", "secret")
    try {
      val srv = FileServerSpec(protocol = "ftp", rootPath = "/drops",
        host = "127.0.0.1", port = ftpd.port, user = "etl", password = "secret")
      val local = FileTransport.resolve(spark, srv, "ext_{aaaa}{mm}{dd}.csv", date)
      assert(new java.io.File(local).isFile, s"staged copy missing at $local")
      val df = graft.sources.CsvSource.read(spark, local, CsvDialect(),
        Seq(FwColumn("k", position = 1, length = 1, dataType = "long"),
          FwColumn("v", position = 2, length = 8)))
      assert(sortedRows(df.select("k", "v")) == Seq(Seq(1L, "alpha"), Seq(2L, "beta")))
      // restage only when the remote changed: same length + mtime → reuse
      val again = FileTransport.resolve(spark, srv, "ext_{aaaa}{mm}{dd}.csv", date)
      assert(again == local)
      val reusedContent = new String(
        Files.readAllBytes(java.nio.file.Paths.get(local)), StandardCharsets.UTF_8)
      assert(reusedContent.contains("alpha"))
      // a corrected re-drop with the SAME byte length but different content
      // and a different remote mtime must restage — length alone cannot
      // tell the two apart (fixed-width dailies are byte-identical in size)
      val remote = root.resolve("drops/ext_20240115.csv")
      Files.write(remote, "k,v\n1,gamma\n2,delt\n".getBytes(StandardCharsets.UTF_8))
      assert(Files.size(remote) == reusedContent.getBytes(StandardCharsets.UTF_8).length,
        "test setup: re-drop must keep the byte length")
      Files.setLastModifiedTime(remote, java.nio.file.attribute.FileTime.fromMillis(
        remote.toFile.lastModified - 3L * 24 * 3600 * 1000))
      val restaged = FileTransport.resolve(spark, srv, "ext_{aaaa}{mm}{dd}.csv", date)
      val content = new String(
        Files.readAllBytes(java.nio.file.Paths.get(restaged)), StandardCharsets.UTF_8)
      assert(content.contains("gamma"), "stale spool served after a same-length re-drop")
    } finally ftpd.stop()
  }

  test("job runner extracts a fixed-width resource over the ftp transport") {
    val root = Files.createTempDirectory(java.nio.file.Paths.get(graft.Scratch.root), "graft_ftp_fw")
    val lines = Seq("000001alpha     ", "000002beta      ")
    Files.write(root.resolve("fw_240115.txt"),
      lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
    val ftpd = new MiniFtpServer(root, "etl", "secret")
    try {
      val job = JobSpec(
        name = "ftp_fw",
        date = date,
        extract = Left(FileResource(
          pathTemplate = "fw_{aa}{mm}{dd}.txt",
          fType = "txt",
          columns = Seq(
            FwColumn("id", position = 1, length = 6, align = "rjust", fillChar = "0", dataType = "long"),
            FwColumn("word", position = 7, length = 10)),
          server = Some(FileServerSpec(protocol = "ftp", rootPath = "/",
            host = "127.0.0.1", port = ftpd.port, user = "etl", password = "secret")))),
        transform = TransformSpec(
          fields = Seq(FieldSpec("id", fieldType = "int"), FieldSpec("word")),
          pkField = Some("id")))
      val routed = JobRunner.run(spark, job, None).routed
      assert(routed.count() == 2)
      assert(sortedRows(routed.select("id", "word")).map(_.take(2))
        == Seq(Seq(1L, "alpha"), Seq(2L, "beta")))
    } finally ftpd.stop()
  }

  test("dbf reads through the Hadoop FS API (ftp spool path)") {
    val root = Files.createTempDirectory(java.nio.file.Paths.get(graft.Scratch.root), "graft_ftp_dbf")
    import spark.implicits._
    val local = root.resolve("t_240115.dbf").toString
    Dbf.write(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), local, charLen = 8)
    val ftpd = new MiniFtpServer(root, "etl", "secret")
    try {
      val srv = FileServerSpec(protocol = "ftp", rootPath = "/",
        host = "127.0.0.1", port = ftpd.port, user = "etl", password = "secret")
      val spooled = FileTransport.resolve(spark, srv, "t_{aa}{mm}{dd}.dbf", date)
      val back = Dbf.read(spark, spooled)
      assert(back.count() == 2)
      assert(back.columns.toSeq == Seq("k", "v"))
    } finally ftpd.stop()
  }
}
