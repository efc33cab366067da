package graft.streaming

import graft.SparkSpec
import graft.functions.CorpusPipeline
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import java.nio.file.Files

/** Randomized pin of the freeze-and-refresh headline claim: for ANY batch
  * split, ANY dup structure (exact dups, near dups, fresh docs), and ANY
  * refresh cadence, the frozen gate's corpus equals per-batch gating's —
  * because frozen + admitted-delta state IS the corpus. The fixtures in
  * FrozenGateSpec chose the dup placement; this spec lets scalacheck
  * choose it.
  */
class FrozenGatePropertySpec extends SparkSpec {
  import spark.implicits._

  private val cfg = CorpusPipeline.Config(
    minChars = 10, requireKnownLang = false,
    nearDupThreshold = None, decontamThreshold = None)

  // genuinely dissimilar base bodies (shared-template texts would all be
  // near dups of each other and collapse the corpus to one doc)
  private val bases = Vector(
    "the quick brown fox jumps over the lazy dog again and again today",
    "completely different content about spark query engines operating at corpus scale",
    "an entirely new document mentioning benchmarks and shuffles in the third batch",
    "watermark discipline and checkpoint hygiene for long running streaming ingestion",
    "fifth distinct prose about adaptive query execution and partition pruning",
    "sixth distinct prose describing bloom filters and banded minhash funnels",
    "seventh body covering catalyst expression codegen and whole stage fusion",
    "eighth body on broadcast thresholds salting skew and exchange reuse")

  // a doc is (id, kind): kind < 8 → fresh base text; 8..15 → EXACT dup of
  // base(kind-8); 16..23 → NEAR dup of base(kind-16) (one appended word)
  private case class Plan(batches: Seq[Seq[(Long, Int)]], cadence: Int)

  private val planGen: Gen[Plan] = for {
    nBatches <- Gen.choose(2, 4)
    sizes <- Gen.listOfN(nBatches, Gen.choose(1, 4))
    kinds <- Gen.listOfN(sizes.sum, Gen.choose(0, 23))
    cadence <- Gen.choose(1, 5)
  } yield {
    var id = 0L
    val docs = kinds.map { k => id += 10; (id, k) }
    val it = docs.iterator
    Plan(sizes.map(n => it.take(n).toList), cadence)
  }

  private def textOf(kind: Int): String =
    if (kind < 8) bases(kind)
    else if (kind < 16) bases(kind - 8)
    else bases(kind - 16) + " addendum"

  private def corpusOf(dir: String): Set[(Long, String)] = {
    val p = java.nio.file.Paths.get(dir)
    if (!java.nio.file.Files.exists(p)) Set.empty
    else spark.read.parquet(dir).select("doc_id", "text")
      .as[(Long, String)].collect().toSet
  }

  test("property: frozen-gate corpus == per-batch corpus for random batches and cadences") {
    (0 until 6).foreach { i =>
      val plan = planGen.pureApply(Gen.Parameters.default, Seed(9100L + i))
      val frames = plan.batches.map(b =>
        b.map { case (id, k) => (id, textOf(k), "web") }
          .toDF("doc_id", "text", "source"))

      val dirA = Files.createTempDirectory(s"fgp_a$i").toString + "/c"
      val perBatch = frames.map(f =>
        CorpusIngestSink.processBatch(spark, dirA, f, cfg))

      val dirB = Files.createTempDirectory(s"fgp_b$i").toString + "/c"
      val gate = new CorpusIngestSink.FrozenGate(dirB, cfg,
        refreshEvery = plan.cadence)
      val frozenAdm = try frames.map(gate.processBatch) finally gate.close()

      assert(frozenAdm == perBatch,
        s"seed ${9100 + i} (cadence ${plan.cadence}, batches ${plan.batches}): " +
          s"admissions $frozenAdm != per-batch $perBatch")
      assert(corpusOf(dirB) == corpusOf(dirA),
        s"seed ${9100 + i}: corpora diverged")
    }
  }
}
