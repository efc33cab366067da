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

  /** (file, min, max, nulls, rows) per row group for one integer column
    * (INT64 native; INT32 widened), across every parquet file under `dir`
    * (recursive). Driver-side and metadata-only; cost is one footer read
    * per file.
    *
    * Pruning built on these bounds must be CONSERVATIVE, so a row group
    * whose stats are unusable — column chunk missing (schema drift), stats
    * disabled, all-null values, or a non-integer physical type — reports
    * the full long range instead of being dropped or crashing: a file
    * data-skipping cannot rule out must stay in the scan.
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
        reader.getFooter.getBlocks.asScala.toSeq.map { block =>
          val bounds = block.getColumns.asScala
            .find(_.getPath.toDotString == column)
            .flatMap { cc =>
              val st = cc.getStatistics
              if (st == null || st.isEmpty || !st.hasNonNullValue) None
              else (st.genericGetMin, st.genericGetMax) match {
                case (mn: java.lang.Long, mx: java.lang.Long) =>
                  Some((mn.longValue(), mx.longValue(), st.getNumNulls))
                case (mn: java.lang.Integer, mx: java.lang.Integer) =>
                  Some((mn.longValue(), mx.longValue(), st.getNumNulls))
                case _ => None
              }
            }
          bounds match {
            case Some((mn, mx, nulls)) =>
              (p.toString, mn, mx, nulls, block.getRowCount)
            case None => // unusable stats → unbounded (never prunable)
              (p.toString, Long.MinValue, Long.MaxValue, 0L, block.getRowCount)
          }
        }
      } finally reader.close()
    }
  }
}
