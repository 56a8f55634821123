package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — the normalization pass a web-corpus
  * pipeline runs before URL-level dedup (the same document fetched as
  * `HTTPS://WWW.Example.com:443/a/?b=2&a=1&utm_source=feed#top` and
  * `https://example.com/a?a=1&b=2` is one document). Rules applied,
  * all RFC-3986-safe or industry-standard crawler policy:
  *
  *   - scheme and host lowercased (case-insensitive by spec)
  *   - default port stripped (`:443` for https, `:80` for http;
  *     other schemes keep their port — `:80` is NOT the default for
  *     e.g. ftp, so stripping it there would conflate distinct
  *     resources)
  *   - leading `www.` stripped (crawler aliasing policy)
  *   - fragment dropped (never sent to the server)
  *   - query params split, empties and `utm_*` tracking params
  *     dropped, remainder SORTED (param order is almost always
  *     semantically irrelevant; sorting makes equal param-sets
  *     compare equal) and rejoined
  *   - trailing slashes stripped from the path
  *
  * What it deliberately does NOT conflate: scheme http vs https,
  * genuinely different hosts, paths, or param VALUES — those are
  * different resources.
  *
  * Everything is built from codegen'd string/array builtins
  * (regexp_extract / regexp_replace / split / filter / array_sort /
  * array_join) — pure map-side work at any scale, no UDF.
  */
object Urls {

  /** Canonical form of `url` per the rules above. Malformed inputs
    * (no `scheme://`) canonicalize to a degenerate `"://"`-prefixed
    * string rather than erroring — callers filter or quarantine. */
  def canonicalize(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val scheme =
      lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostport = lower(regexp_extract(noFrag, "^[^:]+://([^/?#]+)", 1))
    val host = regexp_replace(
      when(scheme === "https", regexp_replace(hostport, ":443$", ""))
        .when(scheme === "http", regexp_replace(hostport, ":80$", ""))
        .otherwise(hostport),
      "^www\\.", "")
    val path = regexp_replace(
      regexp_extract(noFrag, "^[^:]+://[^/?#]+([^?#]*)", 1), "/+$", "")
    val params = array_sort(filter(
      split(regexp_extract(noFrag, "\\?([^#]*)", 1), "&"),
      p => p =!= "" && !p.startsWith("utm_")))
    concat(scheme, lit("://"), host, path,
      when(size(params) > 0, concat(lit("?"), array_join(params, "&")))
        .otherwise(lit("")))
  }
}
