package graft.sources

import java.io.{ObjectInputStream, ObjectOutputStream}

import org.apache.hadoop.conf.Configuration

/** Java-serializable wrapper for a Hadoop [[Configuration]] (which is
  * `Writable` but not `Serializable`), so the driver's session config —
  * including `spark.hadoop.*` overrides like s3a credentials/endpoints —
  * can be broadcast into executor-side FileSystem opens instead of each
  * task reconstructing a bare `new Configuration()` that only sees
  * core-site.xml. */
final class SerializableHadoopConf(@transient var value: Configuration)
    extends Serializable {
  private def writeObject(out: ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}
