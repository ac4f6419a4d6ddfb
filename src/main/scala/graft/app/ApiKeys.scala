package graft.app

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.security.{MessageDigest, SecureRandom}
import java.util.concurrent.ConcurrentHashMap

/** Tenant-scoped API keys with roles and per-key rate limits — the
  * reference's Phase 5 commercial fork ("Multi-tenant auth/RBAC + API
  * keys", /root/reference/COMMERCIAL_ROADMAP.md:117; gateway duties
  * "multi-tenant, RBAC, rate limits, billing hooks", :87).
  *
  * Storage model (encryption-at-rest story, :70): `apikeys.json` under the
  * catalog root holds SHA-256 HASHES of keys, never plaintext — the
  * plaintext exists only in [[issue]]'s return value, once. Authentication
  * hashes the presented key and looks it up; a leaked key file reveals no
  * usable credentials.
  *
  * Roles: `read` may search its tenant; `admin` additionally may /reload it.
  * A key is bound to exactly ONE tenant — the RBAC twin of the per-tenant
  * index isolation (a key cannot name another tenant's data at all).
  *
  * Rate limiting (the billing/usage-limit hook): token bucket per key —
  * `ratePerSec` sustained, `burst` capacity — enforced lock-free-ish (one
  * tiny synchronized block per key, no global lock). Metering counters per
  * tenant (allowed / throttled / denied) are the billing surface.
  */
object ApiKeys {

  final case class KeyRecord(
      keyHash: String,
      tenant: String,
      role: String, // "read" | "admin"
      ratePerSec: Double,
      burst: Int
  )

  private final case class KeyFile(keys: List[KeyRecord])

  def sha256Hex(s: String): String =
    MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  private def keysPath(rootDir: String) = Paths.get(rootDir, "apikeys.json")

  import org.json4s._
  import org.json4s.jackson.{JsonMethods, Serialization}
  private implicit val fmts: Formats = DefaultFormats

  /** Token bucket: `tokens` refills continuously at ratePerSec up to burst.
    * Monotonic clock injectable for deterministic specs.
    */
  private final class Bucket(rec: KeyRecord, now: () => Long) {
    private var tokens: Double = rec.burst.toDouble
    private var last: Long = now()
    def tryConsume(): Boolean = synchronized {
      val t = now()
      tokens = math.min(rec.burst.toDouble, tokens + (t - last) * 1e-9 * rec.ratePerSec)
      last = t
      if (tokens >= 1.0) { tokens -= 1.0; true } else false
    }
  }

  /** Per-tenant metering counters — the billing hook. */
  final class Usage {
    val searches = new java.util.concurrent.atomic.LongAdder
    val throttled = new java.util.concurrent.atomic.LongAdder
    val denied = new java.util.concurrent.atomic.LongAdder
  }

  sealed trait Decision
  case object Missing extends Decision // no key presented -> 401
  case object Invalid extends Decision // unknown key -> 401
  case object Forbidden extends Decision // wrong tenant / insufficient role -> 403
  case object Throttled extends Decision // rate limit -> 429
  final case class Allowed(record: KeyRecord) extends Decision

  final class Registry(records: Seq[KeyRecord], now: () => Long = () => System.nanoTime()) {
    private val byHash: Map[String, KeyRecord] = records.map(r => r.keyHash -> r).toMap
    private val buckets = new ConcurrentHashMap[String, Bucket]()
    private val usageMap = new ConcurrentHashMap[String, Usage]()

    private def usage(tenant: String): Usage =
      usageMap.computeIfAbsent(tenant, _ => new Usage)

    /** Full gate for one request: authenticate, authorize against the
      * requested tenant + required role, then rate-limit. Metering is
      * recorded here so every caller bills identically.
      */
    def check(presented: Option[String], tenant: String, needAdmin: Boolean): Decision =
      presented.filter(_.nonEmpty) match {
        case None => Missing
        case Some(k) =>
          byHash.get(sha256Hex(k)) match {
            case None => Invalid
            case Some(rec) =>
              if (rec.tenant != tenant || (needAdmin && rec.role != "admin")) {
                usage(rec.tenant).denied.increment()
                Forbidden
              } else if (!buckets.computeIfAbsent(rec.keyHash, _ => new Bucket(rec, now)).tryConsume()) {
                usage(rec.tenant).throttled.increment()
                Throttled
              } else {
                usage(rec.tenant).searches.increment()
                Allowed(rec)
              }
          }
      }

    /** Hash-lookup only (no metering, no rate token): who is this key?
      * Used by read-only surfaces that scope their response to the caller's
      * tenant (e.g. /tenants, /usage) rather than gate an action.
      */
    def authenticate(presented: Option[String]): Option[KeyRecord] =
      presented.filter(_.nonEmpty).flatMap(k => byHash.get(sha256Hex(k)))

    /** Per-tenant usage snapshot (tenant -> (allowed, throttled, denied)),
      * sorted — the /metrics billing surface.
      */
    def usageSnapshot: Seq[(String, (Long, Long, Long))] = {
      import scala.jdk.CollectionConverters._
      usageMap.entrySet().asScala.toSeq
        .map(e => e.getKey -> (e.getValue.searches.sum, e.getValue.throttled.sum, e.getValue.denied.sum))
        .sortBy(_._1)
    }
  }

  /** Load the key registry for a catalog root; None when no key file exists
    * (the gateway then serves unauthenticated — single-tenant on-prem mode).
    */
  def load(rootDir: String): Option[Registry] = {
    val p = keysPath(rootDir)
    if (!Files.exists(p)) None
    else Some(new Registry(
      JsonMethods.parse(Files.readString(p)).extract[KeyFile].keys))
  }

  // Serializes read-modify-write issuance within this JVM: two concurrent
  // issue() calls would otherwise both read the same key list and the loser's
  // record would be silently dropped (a customer holding a plaintext key
  // whose hash is in no file). Cross-process issuance needs an external
  // single-issuer discipline (the admin-console model).
  private val issueLock = new Object

  /** Issue a new key for `tenant`: appends its HASH to `apikeys.json`
    * (atomic tmp+move, like every other graft metadata write) and returns
    * the plaintext key — the only time it ever exists outside the caller.
    */
  def issue(
      rootDir: String,
      tenant: String,
      role: String = "read",
      ratePerSec: Double = 50.0,
      burst: Int = 100
  ): String = issueLock.synchronized {
    require(role == "read" || role == "admin", s"unknown role: $role")
    require(ratePerSec > 0 && burst >= 1, s"invalid rate config: $ratePerSec/$burst")
    val rnd = new SecureRandom()
    val bytes = new Array[Byte](24)
    rnd.nextBytes(bytes)
    val key = "gk_" + bytes.map("%02x".format(_)).mkString
    val p = keysPath(rootDir)
    val existing: List[KeyRecord] =
      if (Files.exists(p)) JsonMethods.parse(Files.readString(p)).extract[KeyFile].keys
      else Nil
    val next = KeyFile(existing :+ KeyRecord(sha256Hex(key), tenant, role, ratePerSec, burst))
    Files.createDirectories(p.getParent)
    val tmp = Files.createTempFile(p.getParent, "apikeys", ".tmp")
    Files.writeString(tmp, Serialization.write(next))
    Files.move(tmp, p, StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
    key
  }
}
