"""One-off codegen (round 5, VERDICT r4 item 3): split the 21.5k-line
``plans/driver_queries.py`` monolith into per-domain modules under
``plans/queries/`` with ZERO behavior change.

Layout produced:
- ``plans/queries/_shared.py``   — prelude imports + every helper/const
  not owned by a single domain, in original source order (import-time
  const→const dependencies are order-preserved).
- ``plans/queries/<dom>[N].py``  — the ``q_*`` / ``_sql_*`` functions and
  ``SQL_<DOM>_*`` constants of one domain, original order, chunked so no
  file exceeds ~3500 lines. Cross-module names are imported at the
  BOTTOM of each module (all defs precede the imports, so the cycles
  resolve deterministically: by the time any module's bottom imports
  run, every target module's defs are already bound).
- ``plans/driver_queries.py``    — thin aggregator: star-imports every
  generated module (each defines ``__all__`` including underscore
  names) and carries the original ``build_queries``/``build_oracle_sql``
  verbatim, so every existing ``from ...driver_queries import X`` keeps
  working and registry order is unchanged.

Safety: the pre-split registry fingerprint (key order + per-oracle SQL
md5) is pinned by tests/test_registry_hash.py; the full oracle gate is
re-run after the split.
"""

from __future__ import annotations

import ast
import os
import re
import sys
from collections import defaultdict

# bump function-local relative imports one package level deeper
# (plans/x.py -> plans/queries/x.py): `from ..operators.foo import` ->
# `from ...operators.foo import`, `from .driver_ontology import` ->
# `from ..driver_ontology import`
_REL_IMPORT = re.compile(r"^(\s*from )(\.+)([\w.]*\s+import\s)",
                         re.MULTILINE)


def bump_relative_imports(body: str) -> str:
    return _REL_IMPORT.sub(lambda m: m.group(1) + "." + m.group(2)
                           + m.group(3), body)

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(ROOT, "otd_semantic_framework_spark/plans/driver_queries.py")
OUT = os.path.join(ROOT, "otd_semantic_framework_spark/plans/queries")

DOMAINS = ["kg", "rel", "dedup", "sim", "text", "stats", "curation",
           "stream", "multimodal"]
# _sql_ helpers whose infix is not a registry domain
ODD_SQL = {"kmeans": "sim", "minhash": "dedup", "manual": "kg",
           "vec": "sim"}
CHUNK_LINES = 3300


def fn_domain(name: str) -> str | None:
    key = name[2:] if name.startswith("q_") else name[5:]
    d = key.split("_")[0]
    if d in DOMAINS:
        return d
    return ODD_SQL.get(d)


def const_domain(name: str) -> str | None:
    if not name.startswith("SQL_"):
        return None
    d = name[4:].split("_")[0].lower()
    return d if d in DOMAINS else ODD_SQL.get(d)


def main() -> None:
    text = open(SRC).read()
    lines = text.splitlines(keepends=True)
    tree = ast.parse(text)

    # ---- collect top-level nodes with start lines -----------------------
    items = []  # dicts: kind, names, node, start (1-based)
    for node in tree.body:
        if isinstance(node, ast.FunctionDef):
            if node.name in ("build_queries", "build_oracle_sql"):
                kind = "builder"
            elif node.name.startswith("q_") or node.name.startswith("_sql_"):
                kind = "query"
            else:
                kind = "helper"
            items.append(dict(kind=kind, names=[node.name], node=node))
        elif isinstance(node, ast.Assign):
            names = [t.id for t in node.targets if isinstance(t, ast.Name)]
            items.append(dict(kind="const", names=names, node=node))
        elif isinstance(node, (ast.Import, ast.ImportFrom)):
            items.append(dict(kind="import", names=[], node=node))
        else:
            items.append(dict(kind="other", names=[], node=node))
    for i, it in enumerate(items):
        it["start"] = it["node"].lineno
        it["end_excl"] = (items[i + 1]["node"].lineno
                          if i + 1 < len(items) else len(lines) + 1)

    def src_of(it) -> str:
        return "".join(lines[it["start"] - 1: it["end_excl"] - 1])

    defined_by = {}
    for it in items:
        for n in it["names"]:
            defined_by[n] = it

    qnames = {it["names"][0] for it in items if it["kind"] == "query"}

    def refs(node) -> set[str]:
        return {n.id for n in ast.walk(node) if isinstance(n, ast.Name)}

    # ---- assign each def/const to a module ------------------------------
    for it in items:
        if it["kind"] == "query":
            it["mod"] = fn_domain(it["names"][0])
            assert it["mod"], it["names"]
        elif it["kind"] == "helper":
            rq = refs(it["node"]) & qnames
            it["mod"] = (fn_domain(sorted(rq)[0]) if rq else "_shared")
        elif it["kind"] == "const":
            doms = {const_domain(n) for n in it["names"]}
            it["mod"] = doms.pop() if len(doms) == 1 and None not in doms \
                else "_shared"
        else:
            it["mod"] = None

    # ---- promote to _shared any const whose IMPORT-TIME value refs a
    # name living in a different domain module (iterate to fixpoint) -----
    changed = True
    while changed:
        changed = False
        for it in items:
            if it["kind"] != "const" or it["mod"] == "_shared":
                continue
            for r in refs(it["node"]):
                tgt = defined_by.get(r)
                if tgt and tgt["mod"] not in (None, "_shared", it["mod"]):
                    # the referenced def must be importable before this
                    # const evaluates -> keep the const in _shared only if
                    # the ref target is _shared too; otherwise move const
                    # to the target's module (call order: target earlier
                    # in file keeps working since order is preserved)
                    if tgt["kind"] == "const" or tgt["kind"] == "helper":
                        it["mod"] = tgt["mod"]
                        changed = True
                        break
        # consts left in _shared must not reference domain-owned names
        for it in items:
            if it["kind"] != "const" or it["mod"] != "_shared":
                continue
            for r in refs(it["node"]):
                tgt = defined_by.get(r)
                if tgt and tgt["mod"] not in (None, "_shared"):
                    # pull the referenced def into _shared
                    if tgt["kind"] in ("const", "helper"):
                        tgt["mod"] = "_shared"
                        changed = True

    # sanity: every const (import-time evaluation) may only reference
    # names in _shared, the prelude, or its OWN module (defined earlier
    # in original order — preserved per module). Helpers/queries resolve
    # at call time and are covered by bottom imports.
    for it in items:
        if it["kind"] != "const":
            continue
        for r in refs(it["node"]):
            tgt = defined_by.get(r)
            assert not (tgt and tgt["mod"] not in
                        (None, "_shared", it["mod"])), (it["names"], r)

    # ---- chunk domains by line budget ----------------------------------
    dom_items = defaultdict(list)
    for it in items:
        if it["mod"] and it["mod"] != "_shared":
            dom_items[it["mod"]].append(it)
    module_of = {}   # name -> emitted module name
    chunks = {}      # module name -> [items]
    for dom, its in dom_items.items():
        total = sum(it["end_excl"] - it["start"] for it in its)
        n_chunks = max(1, -(-total // CHUNK_LINES))
        per = -(-total // n_chunks)
        cur, cur_lines, idx = [], 0, 1
        for it in its:
            cur.append(it)
            cur_lines += it["end_excl"] - it["start"]
            if cur_lines >= per and idx < n_chunks:
                chunks[f"{dom}{idx if n_chunks > 1 else ''}"] = cur
                cur, cur_lines, idx = [], 0, idx + 1
        if cur:
            chunks[f"{dom}{idx if n_chunks > 1 else ''}"] = cur
    shared_items = [it for it in items if it["mod"] == "_shared"]
    for mod, its in chunks.items():
        for it in its:
            for n in it["names"]:
                module_of[n] = mod
    for it in shared_items:
        for n in it["names"]:
            module_of[n] = "_shared"

    # ---- prelude: original import block, relative levels bumped by 1 ---
    prelude_lines = []
    for it in items:
        if it["kind"] != "import":
            continue
        node = it["node"]
        seg = src_of(it)
        if isinstance(node, ast.ImportFrom) and node.level > 0:
            dots = "." * node.level
            seg = seg.replace(f"from {dots}", f"from {dots}.", 1)
        prelude_lines.append(seg)
    prelude = "".join(prelude_lines)
    # `from __future__ import annotations` must stay first
    fut = "from __future__ import annotations\n"
    prelude = prelude.replace(fut, "")
    os.makedirs(OUT, exist_ok=True)

    def write_module(name: str, its, doc: str) -> None:
        names = [n for it in its for n in it["names"]]
        body = bump_relative_imports("".join(src_of(it) for it in its))
        # cross-module refs (call-time) -> bottom imports
        need = defaultdict(set)
        for it in its:
            for r in refs(it["node"]):
                tgt_mod = module_of.get(r)
                if tgt_mod and tgt_mod not in (name, "_shared"):
                    need[tgt_mod].add(r)
        bottom = ""
        if need:
            bottom = (
                "\n\n# Cross-module references (resolved at call time; "
                "these imports sit\n# BELOW every def so the module "
                "cycles close deterministically).\n")
            for mod in sorted(need):
                ns = ", ".join(sorted(need[mod]))
                line = f"from .{mod} import {ns}  # noqa: E402\n"
                if len(line) > 79:
                    line = (f"from .{mod} import (  # noqa: E402\n    "
                            + ",\n    ".join(sorted(need[mod])) + ")\n")
                bottom += line
        allq = ",\n    ".join(f'"{n}"' for n in names)
        hdr = (f'"""{doc}\n\nGenerated from plans/driver_queries.py by '
               f'scripts/split_driver_queries.py\n(round 5); original '
               f'source order preserved. Do not edit the monolith\nback '
               f'into existence — edit here.\n"""\n\n{fut}\n')
        share = ("from ._shared import *  # noqa: F401,F403\n"
                 if name != "_shared" else "")
        content = (hdr + prelude + "\n" + share
                   + f"\n__all__ = [\n    {allq},\n]\n\n\n"
                   + body.rstrip() + "\n" + bottom)
        with open(os.path.join(OUT, f"{name}.py"), "w") as f:
            f.write(content)
        print(f"  {name}.py: {content.count(chr(10))} lines, "
              f"{len(names)} defs")

    write_module("_shared", shared_items,
                 "Shared helpers/constants for the driver query modules.")
    for mod in sorted(chunks):
        write_module(mod, chunks[mod],
                     f"Driver queries: `{mod.rstrip('0123456789')}` domain "
                     f"(part {mod[-1] if mod[-1].isdigit() else 1}).")

    with open(os.path.join(OUT, "__init__.py"), "w") as f:
        f.write('"""Per-domain driver query modules (see _shared.py '
                'header)."""\n')

    # ---- aggregator ----------------------------------------------------
    doc_item = items[0]
    assert doc_item["kind"] == "other"  # module docstring
    builders = "".join(src_of(it) for it in items if it["kind"] == "builder")
    stars = "".join(
        f"from .queries.{m} import *  # noqa: F401,F403,E402\n"
        for m in ["_shared"] + sorted(chunks))
    agg = (src_of(doc_item) + fut + "\n"
           + "from collections.abc import Callable  # noqa: E402\n"
           + "from pyspark.sql import DataFrame, SparkSession  "
             "# noqa: E402\n\n"
           + "# re-exported for existing `from ...driver_queries import"
             " ...` callers\n"
           + "from .driver_ontology import (driver_ancestors,  "
             "# noqa: E402,F401\n"
             "                              driver_concepts, "
             "driver_gazetteer,\n"
             "                              driver_scores, driver_wup, "
             "values_sql)\n\n"
           + stars + "\n\n" + builders.rstrip() + "\n")
    with open(SRC, "w") as f:
        f.write(agg)
    print(f"  driver_queries.py (aggregator): {agg.count(chr(10))} lines")


if __name__ == "__main__":
    main()
