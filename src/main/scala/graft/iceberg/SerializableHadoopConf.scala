package graft.iceberg

import java.io.{ObjectInputStream, ObjectOutputStream}

import org.apache.hadoop.conf.Configuration

/** Serializable carrier for a Hadoop `Configuration` (which is itself only
  * `Writable`, not `Serializable`): captured driver-side from the session
  * (HadoopConfs.active()) and shipped inside task closures / DSv2 reader
  * factories so executor-side file opens see the session's fs.* settings
  * and credentials instead of a fresh default `Configuration`. Same shape
  * as Spark's internal SerializableConfiguration, reimplemented here
  * because that class is private[spark].
  */
class SerializableHadoopConf(@transient var value: Configuration) extends Serializable {

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
