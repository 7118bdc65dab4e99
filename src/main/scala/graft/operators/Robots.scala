package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** robots.txt gating for crawl pipelines (RFC 9309 match semantics on
  * the prefix-rule subset): a URL is allowed unless the LONGEST
  * matching rule for its host forbids it, with Allow winning a
  * length tie — the precedence order Googlebot documents and RFC 9309
  * §2.2.2 standardizes. Wildcard (`*`, `$`) patterns are out of scope
  * here: prefix rules are the overwhelming majority in the wild and
  * keep both engines' match semantics exactly mirrorable; a wildcard
  * rule row simply never matches (conservative toward crawling — pair
  * with a blocklist for hard bans).
  *
  * Scale shape: the rule table is domain-scale (thousands of hosts ×
  * a handful of rules) — it BROADCASTS; the corpus-side URL table
  * never shuffles for the match itself, only the per-URL best-rule
  * pick groups by url. Parsing is map-only line explosion + regexp.
  */
object Robots {

  /** `(domain, rule_type, rule_path)` rows from raw robots.txt bodies
    * (the `User-agent: *` convention: every Allow/Disallow line
    * counts; empty-path rules are no-ops per RFC 9309 and drop). */
  def parseRules(robots: DataFrame, domainCol: String, contentCol: String): DataFrame =
    robots
      .select(col(domainCol).as("domain"),
        explode(split(col(contentCol), "\n")).as("line"))
      .select(col("domain"),
        regexp_extract(col("line"), "^(Allow|Disallow):\\s*(\\S+)\\s*$", 1).as("rule_type"),
        regexp_extract(col("line"), "^(Allow|Disallow):\\s*(\\S+)\\s*$", 2).as("rule_path"))
      .filter(col("rule_type") =!= "" && col("rule_path") =!= "")

  /** Gate `urls` (one column of absolute URLs) against parsed rules.
    * Output per URL: (url, domain, path, rule_type, rule_path,
    * allowed) where rule_* name the winning rule ('' when no rule
    * matches) and allowed applies longest-match / Allow-wins-tie. */
  def gate(urls: DataFrame, rules: DataFrame, urlCol: String): DataFrame = {
    val parsed = urls.select(
      col(urlCol).as("url"),
      lower(regexp_extract(col(urlCol), "^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]*)", 1)).as("domain"),
      regexp_extract(col(urlCol), "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1).as("path0"))
      .withColumn("path", when(col("path0") === "", lit("/")).otherwise(col("path0")))
      .drop("path0")
    val joined = parsed.join(
      broadcast(rules.withColumnRenamed("domain", "r_domain")),
      col("domain") === col("r_domain") &&
        col("path").startsWith(col("rule_path")), "left")
    // longest rule wins; 'Allow' < 'Disallow' lexically, so asc
    // rule_type breaks the length tie toward Allow; rule_path last for
    // a total order when two same-type rules tie on length
    val w = Window.partitionBy("url")
      .orderBy(length(col("rule_path")).desc, col("rule_type"), col("rule_path"))
    joined.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select(col("url"), col("domain"), col("path"),
        coalesce(col("rule_type"), lit("")).as("rule_type"),
        coalesce(col("rule_path"), lit("")).as("rule_path"),
        (coalesce(col("rule_type"), lit("")) =!= "Disallow").as("allowed"))
  }
}
