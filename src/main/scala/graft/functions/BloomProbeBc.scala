package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, Predicate, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.util.sketch.BloomFilter

/** Bloom membership probe whose filter rides as a BROADCAST handle,
  * not a plan literal.
  *
  * `Selection.bloomMightContain` embeds the serialized filter as a
  * BinaryType literal — Spark's own runtime-filter shape, and the
  * right call while sidecars are kilobytes. But a literal lives in the
  * task binary, which is re-shipped per job and re-deserialized PER
  * TASK: once the sidecar is sized to a grown corpus (the compactor's
  * rebuild — 16 MB at 5M keys, 2 GB per 1e9 ids for the ANN id-Bloom),
  * every probe job pays tasks × sidecar-bytes of pure serialization,
  * and the probe cost stops being shard-bounded. Here the expression
  * serializes only the broadcast HANDLE; executors fetch the blob once
  * into their block manager, and a JVM-wide cache keyed by broadcast
  * id deserializes it once per executor (not per task).
  *
  * Codegen'd: the probe compiles to one virtual call on the cached
  * filter inside the consuming operator's whole-stage span — same
  * plan shape as the literal form, byte-identical answers (both call
  * `BloomFilter.mightContainLong` on the same xxhash64 keys).
  */
case class BloomMightContainBc(bf: Broadcast[Array[Byte]],
    child: Expression) extends UnaryExpression with Predicate {
  override def nullable: Boolean = child.nullable

  // resolved ONCE per deserialized expression instance (= per task):
  // the per-JVM cache behind BloomProbeCache is a synchronized map,
  // and hitting it per ROW would serialize every scan task in the
  // executor on one monitor in the middle of the codegen'd hot loop
  @transient private lazy val filter: BloomFilter =
    BloomProbeCache.get(bf)

  def test(h: Long): Boolean = filter.mightContainLong(h)

  protected override def nullSafeEval(h: Any): Any =
    test(h.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomProbeBc", this,
      classOf[BloomMightContainBc].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.test($c);")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : BloomMightContainBc = copy(child = newChild)
}

/** One deserialized filter per (executor JVM × broadcast blob): tasks
  * share the parsed bit array instead of each re-reading the blob.
  *
  * The cache key is the FETCHED byte array (`b.value`), not the
  * Broadcast wrapper: every task deserializes its own wrapper instance
  * from the task binary (Broadcast has no equals/hashCode), so an
  * instance-keyed map would still parse once per TASK. `b.value` goes
  * through the block manager, which hands every task in a JVM the same
  * cached array instance while the block stays in memory — and arrays
  * hash/compare by identity, so the WeakHashMap is effectively
  * identity-keyed on the blob. A context restart mints a new broadcast
  * (new block, new array), so no stale filter survives it; weak keys
  * let superseded sidecars unload with their blocks instead of needing
  * a size guard. If the block manager ever evicts and re-fetches the
  * block, the fresh array just re-parses once — correct, merely warm.
  */
object BloomProbeCache {
  private val cache = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[Array[Byte], BloomFilter]())

  def get(b: Broadcast[Array[Byte]]): BloomFilter = {
    val bytes = b.value
    val hit = cache.get(bytes)
    if (hit != null) hit
    else {
      val f = BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))
      cache.put(bytes, f)
      f
    }
  }
}

object BloomProbeBc {
  /** Column form: probe `keyCol` (pre-hashed with xxhash64 by the
    * caller, matching the build side's insert hash).
    */
  def mightContain(bf: Broadcast[Array[Byte]], hashed: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(BloomMightContainBc(bf,
      org.apache.spark.sql.GraftColumnBridge.expression(hashed)))
}
