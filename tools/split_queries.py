#!/usr/bin/env python3
"""One-shot refactor: split the monolithic Queries.scala into per-domain
registry trait modules under src/main/scala/graft/queries/ (r9 verdict
item 5). Each trait has self-type `this: Queries.type =>` so every
unqualified reference keeps resolving; members demote `private` ->
`private[graft]` (trait-private members would be invisible to the object
body holding the registry maps). Mixin order == original declaration
order, so strict-val initialization order is preserved.

Run once from the repo root; idempotence is not needed (delete the
script's output and `git checkout` Queries.scala to retry).
"""
import os, re

SRC = "src/main/scala/graft/Queries.scala"
OUT = "src/main/scala/graft/queries"
lines = open(SRC).read().split("\n")  # 0-based; spec ranges are 1-based

def seg(a, b):
    """1-based inclusive line range."""
    return lines[a - 1:b]

HEADER = seg(1, 16)  # package + imports (line 16 is blank or doc start)
# verify the header slice really ends before the scaladoc
assert lines[16].startswith("/**") or lines[16].strip() == "", lines[16]

# (trait name, list of 1-based inclusive ranges)
SECTIONS = [
    ("FixtureQueries",            [(60, 288)]),
    ("RuleQueries",               [(289, 552)]),
    ("SequentialQueries",         [(553, 895)]),
    ("AggregateQueries",          [(896, 1074)]),
    ("RelationalQueries",         [(1075, 2219)]),
    # dedup/lang section minus the r9 analytics trio (relocated below)
    ("DedupQueries",              [(2220, 2290), (2482, 3038)]),
    ("TextCurationQueries",       [(3039, 4346)]),
    ("EmbeddingMultimodalQueries", [(4347, 5395)]),
    ("CurationQueries",           [(5396, 5833)]),
    ("GeoQueries",                [(5834, 6126)]),
    ("WarehouseQueries",          [(6127, 7079)]),
    # 7080-7083: stale "Registry" banner, dropped
    ("Analytics8Queries",         [(7084, 8187)]),
    # experimentation family + the relocated r9 analytics trio
    ("ExperimentQueries",         [(8188, 10033), (2291, 2481)]),
]

DEMOTE = re.compile(r"^(  )private (def|val|lazy val) ")

DOCS = {
    "FixtureQueries": "Fixture-based pipeline queries (reference-generated oracles).",
    "RuleQueries": "Rule operators over the driver's parquet tables (independent SQL).",
    "SequentialQueries": "Sequential checks at scale over `events`.",
    "AggregateQueries": "Aggregates over parquet (A1-A5).",
    "RelationalQueries": "Relational engine surface (TPC-H-ish; Catalyst-optimized plans).",
    "DedupQueries": "Ext: exact/near dedup, components, language ID.",
    "TextCurationQueries": "Ext: corpus curation, retrieval, sampling, text analysis.",
    "EmbeddingMultimodalQueries": "Ext: embeddings/ANN/PQ + multimodal structure walks.",
    "CurationQueries": "Round-7 curation batch: quotas, hard negatives, topics, BPE.",
    "GeoQueries": "Spatial / trajectory family (ext.Geo).",
    "WarehouseQueries": "Warehouse / sketch / graph / linkage / time-series.",
    "Analytics8Queries": "Round-8 batch: changepoint/seasonality/attribution/audit/graph.",
    "ExperimentQueries": "Experimentation readouts, ops audits, monitors (r8-r9 analytics).",
}

os.makedirs(OUT, exist_ok=True)
for name, ranges in SECTIONS:
    body = []
    for a, b in ranges:
        body.extend(seg(a, b))
    body = [DEMOTE.sub(r"\1private[graft] \2 ", l) for l in body]
    with open(f"{OUT}/{name}.scala", "w") as f:
        f.write("\n".join(HEADER) + "\n")
        f.write(f"/** {DOCS[name]} Split out of the monolithic registry\n"
                f"  * (r9 verdict item 5); every member keeps resolving\n"
                f"  * unqualified through the `Queries.type` self-type. */\n")
        f.write(f"private[graft] trait {name} {{ this: Queries.type =>\n")
        f.write("\n".join(body).rstrip() + "\n}\n")

# rebuild Queries.scala: header, object decl extending the traits,
# shared helpers (17..59 includes the object's scaladoc + open brace),
# registry maps, closing brace
mix = "\n  extends " + "\n  with ".join(n for n, _ in SECTIONS)
head = seg(17, 59)  # scaladoc + "object Queries {" + helpers
head = [l.replace("object Queries {", "object Queries" + mix + " {")
        for l in head]
head = [DEMOTE.sub(r"\1private[graft] \2 ", l) for l in head]
maps = seg(10034, len(lines))
with open(SRC, "w") as f:
    f.write("\n".join(HEADER) + "\n")
    f.write("\n".join(head) + "\n\n")
    f.write("\n".join(maps).rstrip() + "\n")
print("done")
