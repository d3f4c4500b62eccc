package graft.ops

/** PII regex patterns shared by `pipeline_redact_pii` and its spec.
  *
  * Constraints that keep the patterns engine-portable (Java regex on
  * the Spark side, RE2 in the DuckDB oracle): no alternation, no
  * backreferences, no lookaround — leftmost-greedy matching is then
  * identical in both engines. Application order is significant and
  * encoded in the query: email → IPv4 → phone, so the looser phone
  * pattern never consumes part of a dotted quad.
  */
object Redact {
  /** user@host.tld — local part per RFC-ish common practice. */
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted quad, word-bounded so trailing sentence punctuation and
    * longer digit runs don't split into spurious matches. */
  val ipv4Re = "\\b\\d{1,3}(?:\\.\\d{1,3}){3}\\b"

  /** Phone-like digit run: optional +, 9–∞ chars of digits and common
    * separators, digit-terminated. Applied LAST, after IPs are gone. */
  val phoneRe = "\\+?\\d[\\d().\\s-]{7,}\\d"
}
