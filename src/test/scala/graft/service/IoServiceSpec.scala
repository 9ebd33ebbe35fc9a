package graft.service

import java.io.{BufferedReader, InputStreamReader, PrintWriter}
import java.net.Socket

import graft.SparkSpec

class IoServiceSpec extends SparkSpec {

  test("concurrent connections get isolated sessions (per-thread state)") {
    val svc = new IoService(spark)
    try {
      def client() = {
        val c = new Socket("127.0.0.1", svc.boundPort)
        val out = new PrintWriter(c.getOutputStream, true)
        val in = new BufferedReader(new InputStreamReader(c.getInputStream, "UTF-8"))
        (c, (s: String) => { out.println(s); in.readLine() })
      }
      val (c1, s1) = client()
      val (c2, s2) = client()
      assert(s1("EQ operation=create_database;db_name=iso1").contains("true"))
      assert(s1("UD iso1").contains("true"))
      // session 2 still on default; switching to iso1 works (shared catalog),
      // but its current_db was untouched by session 1
      val info2 = s2("EQ operation=select;field=id_dim|version|current_db;from=@info_system")
      assert(info2.contains("true"))
      assert(s2("RS").contains("default"))
      val info1 = s1("EQ operation=select;field=id_dim|version|current_db;from=@info_system")
      assert(info1.contains("true"))
      assert(s1("RS").contains("iso1"))
      c1.close(); c2.close()
    } finally svc.stop()
  }

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
