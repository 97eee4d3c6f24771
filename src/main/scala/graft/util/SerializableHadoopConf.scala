package graft.util

import java.io.{ObjectInputStream, ObjectOutputStream}

import org.apache.hadoop.conf.Configuration

/** A Java-serializable wrapper for a Hadoop [[Configuration]] (which
  * is Writable but not Serializable), for shipping the DRIVER's
  * configuration to executor-side FileSystem work. Building a bare
  * `new Configuration()` on an executor picks up core-site defaults
  * but silently drops every `spark.hadoop.*` session override
  * (credentials, fs.defaultFS) — on clusters configured that way the
  * executor would fail auth or resolve a different filesystem than
  * the driver. Broadcast one of these instead.
  */
class SerializableHadoopConf(@transient var value: Configuration)
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
