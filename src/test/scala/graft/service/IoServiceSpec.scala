package graft.service

import java.io.{BufferedReader, InputStreamReader, PrintWriter}
import java.net.Socket

import graft.SparkSpec

class IoServiceSpec extends SparkSpec {

  test("UD/EQ/RS conversation over a socket (reference client flow)") {
    val svc = new IoService(spark)
    try {
      val c = new Socket("127.0.0.1", svc.boundPort)
      val out = new PrintWriter(c.getOutputStream, true)
      val in = new BufferedReader(new InputStreamReader(c.getInputStream, "UTF-8"))
      def send(s: String): String = { out.println(s); in.readLine() }

      assert(send("EQ operation=random_import;frag_name=w;nrows=5;array_length=2")
        .contains("\"ok\":true"))
      assert(send("EQ operation=select;field=id_dim|oph_size_array(measure);" +
        "field_alias=id_dim|n;from=w;order=id_dim").contains("\"ok\":true"))
      val rs = send("RS")
      assert(rs.contains("\"nrows\":5") && rs.contains("\"fields\":[\"id_dim\",\"n\"]"),
        s"unexpected RS: $rs")
      assert(rs.contains("[1,2]"), s"row values missing: $rs")
      // error path: unknown fragment
      assert(send("EQ operation=select;field=id_dim;from=nope").contains("\"ok\":false"))
      assert(send("BYE").contains("\"ok\":true"))
      c.close()
    } finally svc.stop()
  }
}
