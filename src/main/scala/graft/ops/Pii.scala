package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII scrubbing — the redaction pass a web-text pipeline runs before
  * training (emails / IPv4s / phone numbers → typed placeholder tokens,
  * the C4/RefinedWeb-style cleanup stage). Pure codegen'd
  * regexp_replace/regexp_count projections: no UDFs, no shuffle, scales
  * as a map over the corpus scan.
  *
  * Pattern discipline: every regex here is RE2-compatible (no
  * lookarounds, no backreferences) AND composed only of greedy
  * character-class runs, where Java's leftmost-first and RE2's
  * leftmost-longest semantics agree — so a DuckDB oracle reproduces the
  * redaction byte-for-byte. Order matters and is fixed: emails first
  * (their domains contain dots that would otherwise feed the IP
  * pattern), then IPs, then +-prefixed phones.
  */
object Pii {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
  // conservative: international format only (+ then 7+ digits/dashes) —
  // bare digit runs are too collision-prone with ids/quantities to redact
  val PhoneRe = "\\+[0-9][0-9-]{6,}[0-9]"

  /** Per-doc PII counts (pre-redaction). */
  def piiCounts(text: Column): Column = struct(
    regexp_count(text, lit(EmailRe)).as("n_emails"),
    regexp_count(text, lit(Ipv4Re)).as("n_ips"),
    regexp_count(text, lit(PhoneRe)).as("n_phones"))

  /** The scrubbed text: typed placeholders in place of each match. */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "[EMAIL]"),
        Ipv4Re, "[IP]"),
      PhoneRe, "[PHONE]")
}
