package graft.util

import org.apache.hadoop.conf.Configuration

/** Serializable wrapper for a Hadoop Configuration so executor-side
  * filesystem access (distributed listing, header reads) sees the
  * session's settings — s3a credentials, endpoints, hdfs config — not a
  * fresh default Configuration. Hadoop's Configuration is Writable but
  * not Serializable, hence the manual hooks. */
class SerializableHadoopConf(@transient var value: Configuration)
    extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}
