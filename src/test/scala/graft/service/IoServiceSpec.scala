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

  test("binary wire: PG/UD/EQ(args)/RS frame round trip, byte level") {
    import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream}
    import java.nio.{ByteBuffer, ByteOrder}
    val svc = new IoService(spark, wire = "binary")
    try {
      val c = new java.net.Socket("127.0.0.1", svc.boundPort)
      val out = new DataOutputStream(new BufferedOutputStream(c.getOutputStream))
      val in = new DataInputStream(new BufferedInputStream(c.getInputStream))
      def wu64(v: Long): Unit = out.writeLong(java.lang.Long.reverseBytes(v))
      def wu32(v: Int): Unit = out.writeInt(java.lang.Integer.reverseBytes(v))
      def ru64(): Long = java.lang.Long.reverseBytes(in.readLong())
      def ru32(): Int = java.lang.Integer.reverseBytes(in.readInt())
      def wstr(s: String): Unit = { // C-style: strlen+1 with NUL
        val b = (s + "\u0000").getBytes("UTF-8"); wu64(b.length.toLong); out.write(b)
      }
      def tag(): String = {
        val b = new Array[Byte](2); in.readFully(b); new String(b, "UTF-8")
      }
      // PG ping
      out.write("PG".getBytes); out.flush()
      assert(tag() == "PG")
      // EQ without args: create a fragment
      def eq(q: String): String = {
        out.write("EQ".getBytes); wu32(1); wstr(q); wstr("memory"); out.flush(); tag()
      }
      assert(eq("operation=create_frag;frag_name=bw;" +
        "column_name=id_dim|measure;column_type=long|double_array") == "EQ")
      // EQ with prepared args: DL long + DB packed-double blob
      out.write("EQ".getBytes); wu32(3)
      wstr("operation=insert;frag_name=bw;field=id_dim|measure;value=?1|?2")
      wstr("memory")
      wu64(1L); wu64(1L) // tot_run, curr_run
      wu64(8L); out.write("DL".getBytes)
      out.writeLong(java.lang.Long.reverseBytes(7L))
      val blob = graft.sources.BinaryCodec.packDoubles(Seq(1.5, -2.25))
      wu64(blob.length.toLong); out.write("DB".getBytes); out.write(blob)
      out.flush()
      assert(tag() == "EQ")
      // select it back and fetch the result set frame
      assert(eq("operation=select;field=id_dim|measure;from=bw") == "EQ")
      out.write("RS".getBytes); out.flush()
      assert(tag() == "RS")
      val payloadLen = ru64(); val nRows = ru64(); val nFields = ru32()
      assert(nRows == 1 && nFields == 2)
      val l1 = ru64(); val v1 = new Array[Byte](l1.toInt); in.readFully(v1)
      assert(new String(v1, "UTF-8") == "7\u0000") // NUL-terminated long
      val l2 = ru64(); val v2 = new Array[Byte](l2.toInt); in.readFully(v2)
      assert(l2 == 16) // packed LE doubles, oph-lib-binary-io layout
      val bb = ByteBuffer.wrap(v2).order(ByteOrder.LITTLE_ENDIAN)
      assert(bb.getDouble(0) == 1.5 && bb.getDouble(8) == -2.25)
      assert(payloadLen == 8 + l1 + 8 + l2)
      // unknown db -> ER
      out.write("UD".getBytes); wstr("nope"); wstr("memory"); out.flush()
      assert(tag() == "ER")
      c.close()
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
