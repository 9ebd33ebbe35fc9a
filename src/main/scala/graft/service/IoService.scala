package graft.service

import java.io.{BufferedReader, InputStreamReader, PrintWriter}
import java.net.{ServerSocket, Socket}
import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.sql.SparkSession

import graft.engine.IoServer

/** Thin TCP service surface with the reference's connection semantics
  * (src/server/execs/oph_io_server.c:290-310: accept loop, one handler
  * per connection, per-connection session state; message types
  * PG/UD/SQ/EQ/RS of oph_io_server_thread.c):
  *
  *   UD <db>           use database
  *   EQ <dialect query> execute (create_frag_select / select / ...)
  *   RS [n]            fetch up to n rows of the last result set
  *   BYE               close
  *
  * Responses are single JSON lines: {"ok":true,...} or
  * {"ok":false,"error":...}; RS returns {"ok":true,"nrows":...,
  * "fields":[...],"rows":[[...]]} — the JSON-era analogue of the
  * reference's [nrows][nfields][len,value]* wire format
  * (oph_io_server_thread.c:336-463). Arrays are JSON arrays; everything
  * else is stringified like the reference stringifies non-BLOB values.
  */
final class IoService(spark: SparkSession, port: Int = 0) {
  private val server = new IoServer(spark)
  private val sock = new ServerSocket(port)
  private val running = new AtomicBoolean(true)

  def boundPort: Int = sock.getLocalPort

  private val acceptThread = new Thread(() => {
    while (running.get()) {
      try {
        val client = sock.accept()
        val t = new Thread(() => handle(client))
        t.setDaemon(true)
        t.start()
      } catch { case _: Throwable => /* socket closed */ }
    }
  }, "graft-io-service-accept")
  acceptThread.setDaemon(true)
  acceptThread.start()

  def stop(): Unit = { running.set(false); sock.close() }

  private def jstr(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  private def jval(v: Any): String = v match {
    case null => "null"
    case s: Seq[_] => s.map(jval).mkString("[", ",", "]")
    case a: Array[_] => a.toSeq.map(jval).mkString("[", ",", "]")
    case n: Long => n.toString
    case n: Int => n.toString
    case d: Double => if (d.isNaN || d.isInfinite) jstr(d.toString) else d.toString
    case f: Float => jval(f.toDouble)
    case b: Boolean => b.toString
    case o => jstr(o.toString)
  }

  private def handle(client: Socket): Unit = {
    val in = new BufferedReader(new InputStreamReader(client.getInputStream, "UTF-8"))
    val out = new PrintWriter(client.getOutputStream, true)
    val session = server.newSession()
    try {
      var line = in.readLine()
      while (line != null) {
        val (cmd, arg) = line.indexOf(' ') match {
          case -1 => (line.trim.toUpperCase, "")
          case i => (line.substring(0, i).toUpperCase, line.substring(i + 1).trim)
        }
        try cmd match {
          case "PG" => // ping (the reference's liveness check)
            out.println("""{"ok":true,"pong":true}""")
          case "UD" =>
            session.useDb(arg)
            out.println("""{"ok":true}""")
          case "EQ" =>
            session.execute(arg)
            out.println("""{"ok":true}""")
          case "RS" =>
            val n = if (arg.isEmpty) 1000 else arg.toInt
            session.lastResult match {
              case Some(df) =>
                val rows = df.limit(n).collect()
                val fields = df.columns.map(jstr).mkString("[", ",", "]")
                val body = rows.map(r =>
                  r.toSeq.map(jval).mkString("[", ",", "]"))
                  .mkString("[", ",", "]")
                out.println(s"""{"ok":true,"nrows":${rows.length},"fields":$fields,"rows":$body}""")
              case None =>
                out.println("""{"ok":false,"error":"no result set"}""")
            }
          case "BYE" =>
            out.println("""{"ok":true}""")
            client.close()
            return
          case other =>
            out.println(s"""{"ok":false,"error":${jstr(s"unknown command $other")}}""")
        } catch {
          case e: Throwable =>
            out.println(s"""{"ok":false,"error":${jstr(String.valueOf(e.getMessage))}}""")
        }
        line = in.readLine()
      }
    } finally client.close()
  }
}
