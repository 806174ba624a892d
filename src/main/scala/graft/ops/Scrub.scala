package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII scrubbing (SURVEY.md §2 C17): regex redaction of emails,
  * IPv4 addresses, and phone-shaped numbers — the hygiene pass a
  * training corpus gets before packing. Pure codegen'd
  * `regexp_replace` chain: no UDF, prunable, and the patterns are
  * written in the common subset of Java regex and RE2 so the DuckDB
  * oracle applies the identical semantics.
  *
  * Order matters and is part of the contract: emails first (an email
  * contains digits a phone pattern could nibble), then IPv4, then
  * phones over what remains.
  */
object Scrub {

  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhonePattern = "\\+\\d[\\d ()-]{7,}\\d"

  def redactEmails(text: Column): Column = regexp_replace(text, EmailPattern, "<EMAIL>")
  def redactIpv4(text: Column): Column = regexp_replace(text, Ipv4Pattern, "<IP>")
  def redactPhones(text: Column): Column = regexp_replace(text, PhonePattern, "<PHONE>")

  /** Full redaction chain. */
  def redact(text: Column): Column = redactPhones(redactIpv4(redactEmails(text)))
}
