package graft

import java.io.OutputStream
import java.net.{InetAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}

/** Minimal single-user FTP server for TransportSpec — implements exactly
  * the protocol subset Hadoop's `FTPFileSystem` (via its commons-net
  * client) drives: USER/PASS login, SYST/TYPE/MODE/STRU/ALLO no-ops,
  * PWD/CWD, passive-mode data connections (PASV), UNIX-format LIST, RETR,
  * QUIT. Test infrastructure only — the ENGINE's ftp path is Hadoop's
  * FTPFileSystem (see FileTransport); this class is the wire peer that
  * lets the suite exercise it hermetically on loopback, with no network
  * egress and no external ftpd.
  */
final class MiniFtpServer(root: Path, user: String, password: String) {

  private val server = new ServerSocket(0, 8, InetAddress.getLoopbackAddress)
  @volatile private var running = true

  def port: Int = server.getLocalPort

  private val acceptor = new Thread(() => {
    while (running) {
      try {
        val s = server.accept()
        val t = new Thread(() => {
          try session(s) catch { case _: Throwable => () }
          finally { try s.close() catch { case _: Throwable => () } }
        })
        t.setDaemon(true)
        t.start()
      } catch { case _: Throwable => () } // server socket closed on stop()
    }
  })
  acceptor.setDaemon(true)
  acceptor.start()

  def stop(): Unit = { running = false; server.close() }

  private def session(s: Socket): Unit = {
    val in = new java.io.BufferedReader(
      new java.io.InputStreamReader(s.getInputStream, StandardCharsets.ISO_8859_1))
    val out = s.getOutputStream
    def reply(line: String): Unit = {
      out.write((line + "\r\n").getBytes(StandardCharsets.ISO_8859_1)); out.flush()
    }
    var cwd = "/"
    var data: ServerSocket = null

    def abs(arg: String): String =
      if (arg.isEmpty) cwd
      else if (arg.startsWith("/")) arg
      else if (cwd == "/") "/" + arg
      else cwd + "/" + arg
    def resolve(arg: String): java.io.File =
      abs(arg).split("/").filter(_.nonEmpty)
        .foldLeft(root.toFile)((d, seg) => new java.io.File(d, seg))
    def listingLine(f: java.io.File): String = {
      val flag = if (f.isDirectory) "d" else "-"
      val len = if (f.isDirectory) 4096L else f.length
      // real mtime in "MMM dd yyyy" UNIX-listing form (day granularity,
      // like a real server's non-recent entries) so FileStatus
      // .getModificationTime reflects remote changes — FileTransport's
      // spool reuse check depends on it
      val mt = java.time.LocalDate.ofInstant(
        java.time.Instant.ofEpochMilli(f.lastModified), java.time.ZoneOffset.UTC)
      val mon = mt.getMonth.getDisplayName(
        java.time.format.TextStyle.SHORT, java.util.Locale.ENGLISH)
      f"${flag}rw-r--r--   1 ftp      ftp      $len%10d $mon ${mt.getDayOfMonth}%02d  ${mt.getYear} ${f.getName}"
    }
    def withData(onOpen: => Unit)(body: OutputStream => Unit): Unit = {
      if (data == null) { reply("425 use PASV first"); return }
      onOpen
      val ds = data.accept()
      try body(ds.getOutputStream)
      finally {
        try ds.close() catch { case _: Throwable => () }
        try data.close() catch { case _: Throwable => () }
        data = null
      }
      reply("226 Transfer complete")
    }

    reply("220 graft mini ftp")
    var line = in.readLine()
    while (line != null) {
      val sp = line.indexOf(' ')
      val cmd = (if (sp < 0) line else line.substring(0, sp)).toUpperCase
      val arg = if (sp < 0) "" else line.substring(sp + 1).trim
      cmd match {
        case "USER" => reply(if (arg == user) "331 password required" else "530 unknown user")
        case "PASS" => reply(if (arg == password) "230 logged in" else "530 bad password")
        case "SYST" => reply("215 UNIX Type: L8")
        case "TYPE" | "MODE" | "STRU" | "NOOP" | "ALLO" => reply("200 ok")
        case "PWD"  => reply("257 \"" + cwd + "\" is current directory")
        case "CWD" =>
          if (resolve(arg).isDirectory) { cwd = abs(arg); reply("250 ok") }
          else reply("550 no such directory")
        case "PASV" =>
          if (data != null) data.close()
          data = new ServerSocket(0, 1, InetAddress.getLoopbackAddress)
          val p = data.getLocalPort
          reply(s"227 Entering Passive Mode (127,0,0,1,${p >> 8},${p & 0xff})")
        case "LIST" =>
          // commons-net may prepend switches ("-a ..."); strip them
          val target = resolve(arg.split("\\s+").filterNot(_.startsWith("-"))
            .mkString(" "))
          if (!target.exists) reply("550 no such path")
          else withData(reply("150 Opening data connection")) { os =>
            val entries =
              if (target.isDirectory) target.listFiles().toSeq.sortBy(_.getName)
              else Seq(target)
            val text = entries.map(listingLine).map(_ + "\r\n").mkString
            os.write(text.getBytes(StandardCharsets.ISO_8859_1)); os.flush()
          }
        case "RETR" =>
          val f = resolve(arg)
          if (!f.isFile) reply("550 no such file")
          else withData(reply("150 Opening data connection")) { os =>
            Files.copy(f.toPath, os); os.flush()
          }
        case "SIZE" =>
          val f = resolve(arg)
          if (f.isFile) reply(s"213 ${f.length}") else reply("550 no such file")
        case "QUIT" => reply("221 bye"); return
        case _      => reply("502 not implemented")
      }
      line = in.readLine()
    }
  }
}
