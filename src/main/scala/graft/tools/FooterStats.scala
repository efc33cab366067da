package graft.tools

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile

/** Parquet FOOTER statistics reader — the audit half of the layout story:
  * data skipping at 100 TB works only if every file's min/max column stats
  * are tight, and the way to verify that is to read the ACTUAL footers
  * (metadata-only — no row is scanned, which is the whole point), not to
  * re-aggregate the data. Used by `LayoutSpec` to prove `layoutWrite2d`
  * produces skippable files on both curve dimensions, and usable as a
  * standalone audit over any parquet directory.
  */
object FooterStats {

  /** (file, min, max, nulls, rows) per row group for one INT64 column,
    * across every parquet file under `dir` (recursive). Driver-side and
    * metadata-only; cost is one footer read per file.
    */
  def int64ColumnBounds(dir: String, column: String,
                        conf: Configuration = new Configuration())
      : Seq[(String, Long, Long, Long, Long)] = {
    val fs = FileSystem.get(new java.net.URI(dir), conf)
    val files = {
      val it = fs.listFiles(new Path(dir), true)
      val b = Seq.newBuilder[Path]
      while (it.hasNext) {
        val f = it.next()
        if (f.getPath.getName.endsWith(".parquet")) b += f.getPath
      }
      b.result()
    }
    files.flatMap { p =>
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(p, conf))
      try {
        reader.getFooter.getBlocks.asScala.toSeq.flatMap { block =>
          block.getColumns.asScala.find(
            _.getPath.toDotString == column).toSeq.map { cc =>
            val st = cc.getStatistics
            (p.toString,
              st.genericGetMin.asInstanceOf[java.lang.Long].longValue(),
              st.genericGetMax.asInstanceOf[java.lang.Long].longValue(),
              st.getNumNulls, block.getRowCount)
          }
        }
      } finally reader.close()
    }
  }
}
