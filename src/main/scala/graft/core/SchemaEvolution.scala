package graft.core

import org.apache.spark.sql.types._

/** Case-insensitive, order-insensitive schema comparison and additive
  * evolution.
  *
  * Mirrors the reference's schema semantics
  * (/root/reference/src/main/scala/models/schemas/ArcaneSchema.scala:48-78,
  * 151-157): field names compare case-insensitively, field order and field ids
  * are ignored, Int ≡ Short, every field is nullable, and migration is
  * additive-only (fields present in the incoming batch but missing from the
  * target get appended; nothing is ever dropped or retyped).
  */
object SchemaEvolution {

  /** Int ≡ Short equivalence from ArcaneSchema.typeEquals (reference
    * ArcaneSchema.scala:32-34); everything else must match exactly after
    * stripping nullability.
    */
  def typeEquals(a: DataType, b: DataType): Boolean = (a, b) match {
    case (IntegerType, ShortType) | (ShortType, IntegerType) => true
    case (ArrayType(ea, _), ArrayType(eb, _)) => typeEquals(ea, eb)
    case (sa: StructType, sb: StructType) =>
      sa.fields.length == sb.fields.length &&
        sa.fields.zip(sb.fields).forall { case (fa, fb) =>
          fa.name.equalsIgnoreCase(fb.name) && typeEquals(fa.dataType, fb.dataType)
        }
    case _ => a == b
  }

  /** Fields of `source` with no case-insensitive name match in `target`
    * (reference getMissingFields, ArcaneSchema.scala:151-157).
    */
  def missingFields(target: StructType, source: StructType): Seq[StructField] = {
    val have = target.fields.map(_.name.toLowerCase(java.util.Locale.ROOT)).toSet
    source.fields.toSeq.filterNot(f => have.contains(f.name.toLowerCase(java.util.Locale.ROOT)))
  }

  /** Order-, case- and nullability-insensitive schema equality. */
  def schemaEquals(a: StructType, b: StructType): Boolean = {
    def norm(s: StructType): Map[String, DataType] =
      s.fields.map(f => f.name.toLowerCase(java.util.Locale.ROOT) -> f.dataType).toMap
    val (na, nb) = (norm(a), norm(b))
    na.keySet == nb.keySet && na.forall { case (k, t) => typeEquals(t, nb(k)) }
  }

  /** Additive evolution: target plus any source fields it lacks, all nullable
    * (reference IcebergEntityManager.scala:91-114 creates every added column
    * optional).
    */
  def evolve(target: StructType, source: StructType): StructType =
    missingFields(target, source).foldLeft(target) { (acc, f) =>
      acc.add(f.copy(nullable = true))
    }

  /** Safe numeric widening: the wider of two types when both sit on the
    * same promotion chain (byte → short → int → long; float → double),
    * None otherwise. Value-preserving by construction — no cross-chain
    * coercion (long → double would silently lose precision above 2^53).
    */
  def widened(a: DataType, b: DataType): Option[DataType] = {
    val ints: Seq[DataType] = Seq(ByteType, ShortType, IntegerType, LongType)
    val floats: Seq[DataType] = Seq(FloatType, DoubleType)
    def rank(chain: Seq[DataType], t: DataType): Option[Int] =
      chain.indexOf(t) match { case -1 => None; case i => Some(i) }
    if (a == b) Some(a)
    else (rank(ints, a), rank(ints, b)) match {
      case (Some(ra), Some(rb)) => Some(ints(math.max(ra, rb)))
      case _ => (rank(floats, a), rank(floats, b)) match {
        case (Some(ra), Some(rb)) => Some(floats(math.max(ra, rb)))
        case _ => None
      }
    }
  }

  /** Additive evolution PLUS in-chain numeric widening (the Iceberg/Delta
    * type-widening contract, opt-in beyond the reference's additive-only
    * rule): a target int column receiving long batches becomes long; a
    * float column receiving doubles becomes double. Conflicts outside a
    * promotion chain still surface via [[conflictingFields]] — widening
    * never coerces across kinds.
    */
  def evolveWidening(target: StructType, source: StructType): StructType = {
    val bySource = source.fields.map(f => f.name.toLowerCase(java.util.Locale.ROOT) -> f).toMap
    val retyped = StructType(target.fields.map { tf =>
      bySource.get(tf.name.toLowerCase(java.util.Locale.ROOT))
        .flatMap(sf => widened(tf.dataType, sf.dataType))
        .map(w => tf.copy(dataType = w))
        .getOrElse(tf)
    })
    evolve(retyped, source)
  }

  /** Conflicting fields: same name, incompatible type. The reference treats
    * these as a migration error (only additive changes are legal); surfacing
    * them lets the pipeline fail fast instead of writing corrupt data.
    */
  def conflictingFields(target: StructType, source: StructType): Seq[(StructField, StructField)] = {
    val byName = target.fields.map(f => f.name.toLowerCase(java.util.Locale.ROOT) -> f).toMap
    source.fields.toSeq.flatMap { sf =>
      byName.get(sf.name.toLowerCase(java.util.Locale.ROOT)) match {
        case Some(tf) if !typeEquals(tf.dataType, sf.dataType) => Some((tf, sf))
        case _ => None
      }
    }
  }
}
