#!/usr/bin/env python3
"""One-shot splitter for the monolithic queries/Catalog.scala (r16,
r15 verdict ask #7): emits QuerySpec.scala, CatalogShared.scala (the
helper fixtures, private -> private[queries]), one per-family
Catalog<Family>.scala holding that family's QuerySpec entries in
original order, and a thin Catalog.scala that merges the parts with a
duplicate-key guard. Pure text transform: entry bodies are copied
byte-for-byte (only the one Catalog.pqModel self-reference is
rewritten to CatalogShared.pqModel)."""
import re, sys, os, collections

SRC = "src/main/scala/graft/queries/Catalog.scala"
OUT = "src/main/scala/graft/queries"
lines = open(SRC, encoding="utf-8").read().split("\n")

# ---- structural markers ------------------------------------------------
def find(pred, start=0):
    for i in range(start, len(lines)):
        if pred(lines[i]):
            return i
    raise SystemExit(f"marker not found after {start}")

i_case = find(lambda l: l.startswith("final case class QuerySpec("))
i_obj = find(lambda l: l.startswith("object Catalog {"))
i_specs = find(lambda l: l.startswith("  val specs: Map[String, QuerySpec] = Map("))
i_mapend = find(lambda l: l == "  )", i_specs)
i_end = find(lambda l: l == "}", i_mapend)

header = lines[:i_case]              # package + imports + file doc
case_block = lines[i_case:i_obj]     # QuerySpec case class (+ blank)
helpers = lines[i_obj + 1:i_specs]   # helper defs inside object Catalog
entries_region = lines[i_specs + 1:i_mapend]
tail = lines[i_mapend + 1:i_end]     # def queries / def oracleSql

# split header into package/imports vs the file doc comment
i_doc = next(i for i, l in enumerate(header) if l.startswith("/**"))
pkg_imports = header[:i_doc]
file_doc = header[i_doc:]

# drop the trailing "---- specs" banner from the helpers block
while helpers and (helpers[-1].strip() == "" or "---- specs" in helpers[-1]):
    helpers.pop()

# ---- carve the Map literal into per-entry blocks -----------------------
entry_re = re.compile(r'^    "([a-z0-9_]+)" -> QuerySpec\($')
starts = [i for i, l in enumerate(entries_region) if entry_re.match(l)]
assert starts, "no entries found"
blocks = []  # (key, [lines])
for n, s in enumerate(starts):
    e = starts[n + 1] if n + 1 < len(starts) else len(entries_region)
    # pull the comment block directly above the key into this entry
    b = s
    while b > (starts[n - 1] if n else 0):
        prev = entries_region[b - 1].strip()
        if prev.startswith("//") or prev == "":
            b -= 1
        else:
            break
    if n == 0:
        b = 0
    blocks.append((entry_re.match(entries_region[s]).group(1),
                   entries_region[b:e] if n else entries_region[0:e]))
# re-slice: each block starts where the previous ended (no gaps/overlap)
fixed = []
prev_end = 0
bounds = []
for n, s in enumerate(starts):
    b = s
    while b > prev_end and (entries_region[b - 1].strip().startswith("//")
                            or entries_region[b - 1].strip() == ""):
        b -= 1
    bounds.append(b)
    prev_end = starts[n]
fixed_blocks = []
for n, s in enumerate(starts):
    lo = bounds[n]
    hi = bounds[n + 1] if n + 1 < len(starts) else len(entries_region)
    key = entry_re.match(entries_region[s]).group(1)
    fixed_blocks.append((key, entries_region[lo:hi]))
blocks = fixed_blocks
assert sum(len(b) for _, b in blocks) == len(entries_region)

# ---- family assignment --------------------------------------------------
FAMILIES = [
    (("agg_",), "Agg"),
    (("sql_", "fn_"), "SqlFn"),
    (("scan_", "sink_", "catalog_", "layout_"), "ScanSink"),
    (("filter_", "proj_", "flatten_"), "Proj"),
    (("join_",), "Joins"),
    (("win_", "setop_"), "WinSetop"),
    (("dedup_",), "Dedup"),
    (("sim_", "search_"), "Sim"),
    (("text_",), "Text"),
    (("profile_", "prep_"), "Profile"),
    (("graph_", "geo_"), "GraphGeo"),
    (("ts_",), "Ts"),
    (("sample_",), "Sample"),
    (("multimodal_",), "Multimodal"),
    (("stream_", "upsert_"), "Stream"),
]
def family(key):
    for prefixes, name in FAMILIES:
        if any(key.startswith(p) for p in prefixes):
            return name
    return "Misc"

bykey = collections.OrderedDict()
for key, blk in blocks:
    bykey.setdefault(family(key), []).append((key, blk))

# ---- emit ----------------------------------------------------------------
def write(path, text):
    with open(path, "w", encoding="utf-8") as f:
        f.write(text if text.endswith("\n") else text + "\n")

def fix_refs(s):
    return s.replace("Catalog.pqModel", "CatalogShared.pqModel")

imports_text = "\n".join(pkg_imports).rstrip() + "\n"

# QuerySpec.scala
write(f"{OUT}/QuerySpec.scala",
      imports_text.split("\n\n")[0] + "\n\n" +  # just the package line
      "import org.apache.spark.sql.{DataFrame, SparkSession}\n\n" +
      "\n".join(file_doc).rstrip() + "\n" +
      "\n".join(case_block).rstrip() + "\n")

# CatalogShared.scala
shared_helpers = []
for l in helpers:
    if l.startswith("  private def ") or l.startswith("  private val ") \
       or l.startswith("  private lazy val "):
        l = l.replace("  private ", "  private[queries] ", 1)
    shared_helpers.append(fix_refs(l))
write(f"{OUT}/CatalogShared.scala",
      imports_text + "\n" +
      "/** Shared fixtures and helper columns for the per-family catalog\n"
      "  * objects (the r16 split of the former monolithic Catalog.scala):\n"
      "  * table access, decimal-exact accumulators, the staged-artifact\n"
      "  * and model-memo caches, and every cross-key oracle CTE fragment.\n"
      "  * private[queries]: reachable from the Catalog* family files only.\n"
      "  */\n"
      "private[queries] object CatalogShared {\n" +
      "\n".join(shared_helpers).rstrip() + "\n}\n")

# family files
part_names = []
for fam, ents in bykey.items():
    name = f"Catalog{fam}"
    part_names.append(name)
    body = []
    for key, blk in ents:
        txt = "\n".join(fix_refs(l) for l in blk).rstrip()
        if not txt.endswith(","):
            txt += ","
        body.append(txt)
    nloc = sum(len(b) for _, b in ents)
    write(f"{OUT}/{name}.scala",
          imports_text + "\n" +
          f"/** {fam} family of the operator catalog ({len(ents)} keys) —\n"
          f"  * one slice of the r16 per-family split; entries are verbatim\n"
          f"  * from the former monolithic Catalog.scala, in original order.\n"
          f"  * Merged into the driver contract by [[Catalog.specs]]. */\n"
          f"private[queries] object {name} {{\n"
          f"  import CatalogShared._\n\n"
          f"  val specs: Map[String, QuerySpec] = Map(\n\n" +
          "\n\n".join(body) +
          "\n  )\n}\n")
    print(f"{name}.scala: {len(ents)} keys")

# Catalog.scala
parts_seq = ",\n    ".join(f"{n}.specs" for n in part_names)
write(f"{OUT}/Catalog.scala",
      "package graft.queries\n\n"
      "import org.apache.spark.sql.{DataFrame, SparkSession}\n\n"
      "/** The operator catalog — one QuerySpec per SURVEY.md §2 key,\n"
      "  * assembled from the per-family Catalog* objects (r16 split; the\n"
      "  * driver contract `specs`/`queries`/`oracleSql` is unchanged).\n"
      "  * Each part owns its keys; a duplicate key across parts is a\n"
      "  * construction error, caught eagerly below.\n"
      "  */\n"
      "object Catalog {\n\n"
      "  private val parts: Seq[Map[String, QuerySpec]] = Seq(\n"
      f"    {parts_seq})\n\n"
      "  val specs: Map[String, QuerySpec] = {\n"
      "    val merged = parts.reduce(_ ++ _)\n"
      "    val total = parts.map(_.size).sum\n"
      "    require(merged.size == total, {\n"
      "      val dups = parts.flatMap(_.keys)\n"
      "        .groupBy(identity).collect { case (k, v) if v.size > 1 => k }\n"
      "      s\"duplicate catalog keys across parts: ${dups.toSeq.sorted.mkString(\", \")}\"\n"
      "    })\n"
      "    merged\n"
      "  }\n\n" +
      "\n".join(tail).rstrip() + "\n}\n")
print("total keys:", len(blocks))
