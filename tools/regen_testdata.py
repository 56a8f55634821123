#!/usr/bin/env python3
"""Dev-only seed-fuzz testdata regenerator (not shipped library code).

Twice (r9 drift, r10 HITS) a query passed the committed
/root/testdata at all three SFs and then failed the driver's gate on
REGENERATED parquet — data-dependent Spark-vs-DuckDB divergence
(integer width, tie order) that one fixed dataset can't expose. This
script writes a structurally-equivalent dataset (same tables, schemas
and value domains as TESTDATA.md) from an arbitrary seed, with
deliberately nastier degree skew (zipf-ish hub customers/parts) so
width-fragile chains overflow earlier, for tools/fuzz_gate.sh to run
the full Verify + check.py loop against.

Usage: python3 tools/regen_testdata.py --seed 7 --sf 0.01 --out /tmp/fuzz7
"""
import argparse
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
NATIONS = [
    "ALGERIA", "ARGENTINA", "BRAZIL", "CANADA", "EGYPT", "ETHIOPIA",
    "FRANCE", "GERMANY", "INDIA", "INDONESIA", "IRAN", "IRAQ", "JAPAN",
    "JORDAN", "KENYA", "MOROCCO", "MOZAMBIQUE", "PERU", "CHINA",
    "ROMANIA", "SAUDI ARABIA", "VIETNAM", "RUSSIA", "UNITED KINGDOM",
    "UNITED STATES"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD",
            "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
              "5-LOW"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
COLORS = ["red", "green", "blue", "small", "large", "plated", "rusty",
          "shiny"]
NOUNS = ["ring", "widget", "bolt", "gear", "cog", "spring", "plate",
         "valve"]
EVENT_TYPES = ["click", "signup", "error", "view", "purchase"]
LANGS = ["en", "de", "fr", "es", "zh"]
WORDS = ("key agg row scan slow fast table value part hash merge batch "
         "spark the a line sort window join group filter shuffle stage "
         "plan column codegen push prune").split()


def zipf_keys(rng, n, hi, a, hub_mult=1):
    """n keys in [0, hi) with a zipf-ish heavy tail, capped to range.
    hub_mult > 1 additionally redirects 1/hub_mult of all draws onto
    key 0 — a degree regime (one mega-hub owning a constant fraction
    of ALL edges) no zipf exponent produces."""
    z = rng.zipf(a, size=n)
    keys = ((z - 1) % hi).astype(np.int64)
    if hub_mult > 1:
        keys[rng.random(n) < 1.0 / hub_mult] = 0
    return keys


def money(rng, n, lo, hi):
    return np.round(rng.uniform(lo, hi, n), 2)


def days(rng, n, start, span_days):
    base = np.datetime64(start).astype("datetime64[us]")
    off = rng.integers(0, span_days, n) * 86400000000
    return base + off.astype("timedelta64[us]")


def write(out, name, cols):
    pq.write_table(pa.table(cols), os.path.join(out, f"{name}.parquet"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, required=True)
    ap.add_argument("--sf", type=float, default=0.01)
    ap.add_argument("--out", required=True)
    ap.add_argument("--zipf", type=float, default=1.4,
                    help="degree-skew exponent for fk columns")
    ap.add_argument("--hub-mult", type=int, default=1,
                    help="redirect this fraction denominator of fk "
                    "draws onto key 0 (2 = half of all draws hit the "
                    "hub) — hub-degree extremes past what any zipf "
                    "exponent reaches")
    ap.add_argument("--value-scale", type=float, default=1.0,
                    help="multiply events.value / money domains — "
                    "drives integer-width chains toward their bounds")
    args = ap.parse_args()
    rng = np.random.default_rng(args.seed)
    sf = args.sf
    os.makedirs(args.out, exist_ok=True)

    n_cust = max(int(150000 * sf), 30)
    n_supp = max(int(10000 * sf), 10)
    n_part = max(int(200000 * sf), 40)
    n_ord = max(int(1500000 * sf), 150)
    n_li = max(int(6000000 * sf), 600)
    n_ev = max(int(1000000 * sf), 200)
    n_doc = max(int(50000 * sf), 60)
    n_emb = max(int(50000 * sf), 60)

    write(args.out, "region", {
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS})
    write(args.out, "nation", {
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": NATIONS,
        "n_regionkey": pa.array(rng.integers(0, 5, 25), pa.int32())})
    write(args.out, "customer", {
        "c_custkey": pa.array(range(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": money(rng, n_cust, -1000, 10000),
        "c_mktsegment": rng.choice(SEGMENTS, n_cust)})
    write(args.out, "supplier", {
        "s_suppkey": pa.array(range(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": money(rng, n_supp, -1000, 10000)})
    write(args.out, "part", {
        "p_partkey": pa.array(range(n_part), pa.int64()),
        "p_name": [f"{rng.choice(COLORS)} {rng.choice(NOUNS)}"
                   for _ in range(n_part)],
        "p_brand": [f"Brand#{rng.integers(1, 26)}"
                    for _ in range(n_part)],
        "p_type": rng.choice(PTYPES, n_part),
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": np.round(900.0 + np.arange(n_part) * 0.1, 2)})
    write(args.out, "orders", {
        "o_orderkey": pa.array(range(n_ord), pa.int64()),
        # zipf-skewed custkeys: hub customers get order counts far past
        # uniform — stresses degree-dependent integer chains
        "o_custkey": pa.array(zipf_keys(rng, n_ord, n_cust, args.zipf,
                                        args.hub_mult), pa.int64()),
        "o_orderstatus": rng.choice(["P", "F", "O"], n_ord),
        "o_totalprice": money(rng, n_ord, 1000, 500000),
        "o_orderdate": pa.array(days(rng, n_ord, "1995-01-01", 2400),
                                pa.timestamp("us")),
        "o_orderpriority": rng.choice(PRIORITIES, n_ord)})
    write(args.out, "lineitem", {
        "l_orderkey": pa.array(rng.integers(0, n_ord, n_li), pa.int64()),
        "l_partkey": pa.array(zipf_keys(rng, n_li, n_part, args.zipf,
                                        args.hub_mult), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(rng.integers(1, 8, n_li), pa.int32()),
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": money(rng, n_li, 900, 105000),
        "l_discount": np.round(rng.integers(0, 11, n_li) * 0.01, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) * 0.01, 2),
        "l_returnflag": rng.choice(["A", "N", "R"], n_li),
        "l_linestatus": rng.choice(["F", "O"], n_li),
        "l_shipdate": pa.array(days(rng, n_li, "1995-01-01", 2500),
                               pa.timestamp("us"))})
    ts0 = np.datetime64("2024-01-01").astype("datetime64[us]")
    ev_ts = ts0 + np.sort(
        rng.integers(0, 30 * 86400000000, n_ev)).astype("timedelta64[us]")
    write(args.out, "events", {
        "event_id": pa.array(range(n_ev), pa.int64()),
        "ts": pa.array(ev_ts, pa.timestamp("us")),
        "user_id": pa.array(zipf_keys(rng, n_ev, max(int(15000 * sf), 20),
                                      args.zipf, args.hub_mult),
                            pa.int64()),
        "event_type": rng.choice(EVENT_TYPES, n_ev),
        "value": money(rng, n_ev, 0.01, 500 * args.value_scale),
        "props": [json.dumps({"k": int(k)})
                  for k in rng.integers(0, 100, n_ev)]})
    # documents: planted exact dups + shifted near-dups so dedup /
    # similarity queries have non-trivial matches on every seed.
    # Each doc's text is salted with its language's function words
    # (~20% of positions) so language-ID (q253) has REAL per-language
    # signal on fuzz data instead of one shared vocabulary; dups copy
    # the source doc's lang so exact-dup texts never contradict it.
    lang_markers = {"en": ["the", "of", "and"],
                    "de": ["der", "und", "die"],
                    "fr": ["le", "la", "et"],
                    "es": ["el", "los", "y"],
                    "zh": ["的", "是", "了"]}
    langs = list(rng.choice(LANGS, n_doc))
    texts = []
    for i in range(n_doc):
        nw = int(rng.integers(10, 90))
        w = list(rng.choice(WORDS, nw))
        m = lang_markers[langs[i]]
        for j in range(len(w)):
            if rng.random() < 0.2:
                w[j] = m[int(rng.integers(0, len(m)))]
        if i % 7 == 3 and texts:           # exact dup of an earlier doc
            k = int(rng.integers(0, len(texts)))
            texts.append(texts[k]);  langs[i] = langs[k]
        elif i % 11 == 5 and texts:        # shifted near-dup
            k = int(rng.integers(0, len(texts)))
            base = texts[k].split()
            texts.append(" ".join([str(rng.choice(WORDS))] + base[:-1]))
            langs[i] = langs[k]
        else:
            texts.append(" ".join(w))
    write(args.out, "documents", {
        "doc_id": pa.array(range(n_doc), pa.int64()),
        "text": texts,
        "lang": langs,
        "source": [f"src{rng.integers(0, 20)}" for _ in range(n_doc)],
        "n_chars": pa.array([len(t) for t in texts], pa.int64())})
    centers = rng.normal(0, 0.12, (10, 64))
    labels = rng.integers(0, 10, n_emb)
    vecs = (centers[labels] +
            rng.normal(0, 0.08, (n_emb, 64))).astype(np.float32)
    write(args.out, "embeddings", {
        "vec_id": pa.array(range(n_emb), pa.int64()),
        "embedding": pa.array([v.tolist() for v in vecs],
                              pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32())})
    print(f"wrote sf={sf} seed={args.seed} -> {args.out} "
          f"(lineitem={n_li}, orders={n_ord}, docs={n_doc})")


if __name__ == "__main__":
    main()
