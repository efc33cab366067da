package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal, Md5}
import graft.functions.expressions._

/** SQL surface for the engine's fused expressions.
  *
  * Registers every graft expression as a native SQL function so pure-SQL
  * users (spark.sql, Thrift server, SQL files) get the same codegen'd
  * single-pass kernels the DataFrame API uses — not a UDF wrapper:
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * spark.sql("SELECT graft_lang_id(text), graft_fingerprint(text) FROM docs")
  * }}}
  *
  * For a session that already exists (extensions are applied only at session
  * construction), use [[GraftExtensions.register]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name), builder))
    }
    // collapse redundant idempotent-kernel applications (see the rule's doc)
    ext.injectOptimizerRule(_ => GraftOptimizations)
  }
}

object GraftExtensions {

  /** Register all graft functions into an existing session's registry. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }

  private def intLit(args: Seq[Expression], pos: Int, fn: String): Int =
    args(pos) match {
      case Literal(v: Int, _)  => v
      case Literal(v: Long, _) => v.toInt
      case other => throw new IllegalArgumentException(
        s"$fn: argument ${pos + 1} must be an integer literal, got $other")
    }

  private def arity(args: Seq[Expression], n: Int, fn: String): Unit =
    require(args.length == n, s"$fn expects $n arguments, got ${args.length}")

  /** name -> builder for every SQL-exposable fused expression. Expressions
    * whose constructors need runtime data (the IVF codebook) stay
    * DataFrame-only.
    */
  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_normalized_text" -> { args =>
      arity(args, 1, "graft_normalized_text"); NormalizedTextExpr(args.head)
    },
    "graft_fingerprint" -> { args =>
      arity(args, 1, "graft_fingerprint"); Md5(NormalizedTextExpr(args.head))
    },
    "graft_lang_id" -> { args =>
      arity(args, 1, "graft_lang_id"); LangIdExpr(args.head)
    },
    "graft_text_stats" -> { args =>
      arity(args, 1, "graft_text_stats"); TextStatsExpr(args.head)
    },
    "graft_repetition_stats" -> { args =>
      arity(args, 1, "graft_repetition_stats"); RepetitionStatsExpr(args.head)
    },
    "graft_misra_gries" -> { args =>
      arity(args, 2, "graft_misra_gries")
      MisraGriesAgg(args.head, intLit(args, 1, "graft_misra_gries"))
    },
    "graft_simhash64" -> { args =>
      arity(args, 1, "graft_simhash64"); SimHash64Expr(args.head)
    },
    "graft_shingle_hashes" -> { args =>
      arity(args, 2, "graft_shingle_hashes")
      ShingleHashesExpr(args.head, intLit(args, 1, "graft_shingle_hashes"))
    },
    "graft_word_ngram_hashes" -> { args =>
      arity(args, 2, "graft_word_ngram_hashes")
      WordNgramHashesExpr(args.head, intLit(args, 1, "graft_word_ngram_hashes"))
    },
    "graft_minhash_signature" -> { args =>
      arity(args, 2, "graft_minhash_signature")
      MinHashSignatureExpr(args.head, intLit(args, 1, "graft_minhash_signature"))
    },
    "graft_winnow" -> { args =>
      arity(args, 2, "graft_winnow")
      WinnowExpr(args.head, intLit(args, 1, "graft_winnow"))
    },
    "graft_char_entropy" -> { args =>
      arity(args, 1, "graft_char_entropy"); CharEntropyExpr(args.head)
    },
    "graft_md5_word_ngram_hashes" -> { args =>
      arity(args, 2, "graft_md5_word_ngram_hashes")
      Md5WordNgramHashesExpr(args.head, intLit(args, 1, "graft_md5_word_ngram_hashes"))
    },
    "graft_md5_winnow" -> { args =>
      arity(args, 3, "graft_md5_winnow")
      Md5WinnowExpr(args.head, intLit(args, 1, "graft_md5_winnow"),
        intLit(args, 2, "graft_md5_winnow"))
    },
    "graft_hyperplane_buckets" -> { args =>
      arity(args, 4, "graft_hyperplane_buckets")
      HyperplaneBucketsExpr(args.head,
        intLit(args, 1, "graft_hyperplane_buckets"),
        intLit(args, 2, "graft_hyperplane_buckets"),
        intLit(args, 3, "graft_hyperplane_buckets"))
    },
    "graft_cosine_similarity" -> { args =>
      arity(args, 2, "graft_cosine_similarity")
      CosineSimilarityExpr(args.head, args(1))
    },
    "graft_dot_product" -> { args =>
      arity(args, 2, "graft_dot_product")
      DotProductExpr(args.head, args(1))
    },
    "graft_nfc_normalize" -> { args =>
      arity(args, 1, "graft_nfc_normalize"); NfcNormalizeExpr(args.head)
    },
    "graft_compression_ratio" -> { args =>
      arity(args, 1, "graft_compression_ratio"); CompressionRatioExpr(args.head)
    },
    "graft_hilbert_index_2d" -> { args =>
      arity(args, 3, "graft_hilbert_index_2d")
      HilbertIndex2dExpr(args.head, args(1), intLit(args, 2, "graft_hilbert_index_2d"))
    },
    "graft_fix_mojibake" -> { args =>
      arity(args, 1, "graft_fix_mojibake"); FixMojibakeExpr(args.head)
    },
    "graft_vector_mean" -> { args =>
      arity(args, 1, "graft_vector_mean"); VectorMeanAgg(args.head)
    },
    "graft_vector_minmax" -> { args =>
      arity(args, 1, "graft_vector_minmax"); VectorMinMaxAgg(args.head)
    },
    "graft_gear_chunks" -> { args =>
      arity(args, 4, "graft_gear_chunks")
      GearChunksExpr(args.head, intLit(args, 1, "graft_gear_chunks"),
        intLit(args, 2, "graft_gear_chunks"), intLit(args, 3, "graft_gear_chunks"))
    },
    "graft_strided_resize" -> { args =>
      arity(args, 2, "graft_strided_resize")
      StridedResizeExpr(args.head, intLit(args, 1, "graft_strided_resize"))
    },
    "graft_resize_image" -> { args =>
      arity(args, 2, "graft_resize_image")
      ResizeImageExpr(args.head, intLit(args, 1, "graft_resize_image"))
    }
  )
}
