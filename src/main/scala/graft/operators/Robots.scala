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
    * counts; empty-path rules are no-ops per RFC 9309 and drop).
    * RFC 9309 field names are case-insensitive ('disallow:' is common
    * in the wild) and lines may carry trailing `# comments` — both
    * are handled here, with rule_type normalized to the capitalized
    * form so the Allow-before-Disallow tie-break stays one lexical
    * comparison. */
  def parseRules(robots: DataFrame, domainCol: String, contentCol: String): DataFrame = {
    val noComment = regexp_replace(col("line"), "#.*$", "")
    val pat = "(?i)^(allow|disallow):\\s*(\\S+)\\s*$"
    robots
      .select(col(domainCol).as("domain"),
        explode(split(col(contentCol), "\n")).as("line"))
      .select(col("domain"),
        lower(regexp_extract(noComment, pat, 1)).as("t0"),
        regexp_extract(noComment, pat, 2).as("rule_path"))
      .filter(col("t0") =!= "" && col("rule_path") =!= "")
      .select(col("domain"),
        when(col("t0") === "allow", "Allow").otherwise("Disallow").as("rule_type"),
        col("rule_path"))
  }

  /** Gate `urls` (one column of absolute URLs) against parsed rules.
    * Output per URL: (url, domain, path, rule_type, rule_path,
    * allowed) where rule_* name the winning rule ('' when no rule
    * matches) and allowed applies longest-match / Allow-wins-tie. */
  def gate(urls: DataFrame, rules: DataFrame, urlCol: String): DataFrame = {
    // rules match against path+QUERY (RFC 9309 / the Googlebot
    // reference matcher — a `Disallow: /search?` rule must fire); the
    // fragment never participates
    val pathQ = regexp_extract(col(urlCol), "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)", 1)
    val parsed = urls.select(
      col(urlCol).as("url"),
      lower(regexp_extract(col(urlCol), "^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]*)", 1)).as("domain"),
      when(pathQ === "", lit("/")).otherwise(pathQ).as("path"))
    // the winning rule is a function of the DISTINCT (domain, path):
    // rank over that small relation and join back, so gating an
    // un-deduped frontier log preserves input row multiplicity
    val targets = parsed.select("domain", "path").distinct()
    val joined = targets.join(
      broadcast(rules.withColumnRenamed("domain", "r_domain")),
      col("domain") === col("r_domain") &&
        col("path").startsWith(col("rule_path")), "left")
    // longest rule wins; 'Allow' < 'Disallow' lexically, so asc
    // rule_type breaks the length tie toward Allow; rule_path last for
    // a total order when two same-type rules tie on length
    val w = Window.partitionBy("domain", "path")
      .orderBy(length(col("rule_path")).desc, col("rule_type"), col("rule_path"))
    val best = joined.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select(col("domain"), col("path"),
        coalesce(col("rule_type"), lit("")).as("rule_type"),
        coalesce(col("rule_path"), lit("")).as("rule_path"))
    parsed.join(best, Seq("domain", "path"))
      .select(col("url"), col("domain"), col("path"),
        col("rule_type"), col("rule_path"),
        (col("rule_type") =!= "Disallow").as("allowed"))
  }
}
