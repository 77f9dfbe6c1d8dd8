"""Mechanically split plans/registry.py into per-family modules.

Pure move, no semantics: each top-level statement of the old registry is
emitted verbatim (same text, leading section comments attached) into one
of the per-family modules, a shared-helper module, the primitives module
(_core), or the slimmed registry (signature-shard machinery + window
ordering).  Run once; prints a routing report, then writes files.
"""

from __future__ import annotations

import ast
import sys
from collections import defaultdict
from pathlib import Path

PLANS = Path("openseizuredatabase_spark/plans")
SRC = PLANS / "registry.py"

# query-name first letter -> family module
FAMILY_OF_PREFIX = {
    "a": "q_relational", "f": "q_relational", "j": "q_relational",
    "u": "q_relational", "s": "q_relational",
    "d": "q_lake", "z": "q_lake", "e": "q_lake", "r": "q_lake",
    "w": "q_window", "c": "q_window",
    "m": "q_ml", "n": "q_stats",
    "t": "q_text", "p": "q_text",
    "v": "q_vector",
}
FAMILY_DOC = {
    "q_relational": "Relational core: scans, filters, joins, set algebra, "
    "source/sink and streaming queries (SURVEY A*/F*/J*/U*/S*).",
    "q_lake": "Dedup, grouping and lakehouse maintenance queries "
    "(SURVEY D*, zone/vacuum Z*).",
    "q_window": "Window, time-series and signal-conversion queries "
    "(SURVEY W*, C*).",
    "q_ml": "ML training/inference queries (SURVEY M*).",
    "q_stats": "Statistical-test and distribution-diagnostic queries (N*).",
    "q_text": "Text-analysis and pipeline queries over `documents` "
    "(T*, P*).",
    "q_vector": "Similarity-search / ANN queries over `embeddings` (V*).",
}
FAMILIES = list(FAMILY_DOC)

SIG_NAMES = {
    "_sig_members", "_sig_shard_of", "_sig_members_for",
    "_make_sig_bundle", "_reorder_registry", "_SIG_SHARD_FAMILIES",
    "_DRIVER_WINDOW", "_sig_q6", "_sig_str", "_SIG_EXTRA",
}
CORE_NAMES = {"QuerySpec", "QUERIES", "query", "_t", "_ts"}

src = SRC.read_text()
lines = src.splitlines(keepends=True)
tree = ast.parse(src)


def node_span(i: int) -> tuple[int, int]:
    """1-based [start, end] incl. decorators and leading comments/blanks."""
    node = tree.body[i]
    start = node.lineno
    if getattr(node, "decorator_list", None):
        start = min(start, min(d.lineno for d in node.decorator_list))
    prev_end = 0 if i == 0 else tree.body[i - 1].end_lineno
    # pull in the comment/blank block between prev node and this one
    lead = start
    for ln in range(start - 1, prev_end, -1):
        t = lines[ln - 1].strip()
        if t == "" or t.startswith("#"):
            lead = ln
        else:
            break
    return lead, node.end_lineno


def node_text(i: int) -> str:
    s, e = node_span(i)
    return "".join(lines[s - 1:e])


def defined_names(node) -> set[str]:
    out = set()
    if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
        out.add(node.name)
    elif isinstance(node, ast.Assign):
        for t in node.targets:
            if isinstance(t, ast.Name):
                out.add(t.id)
    elif isinstance(node, ast.AnnAssign) and isinstance(node.target, ast.Name):
        out.add(node.target.id)
    return out


def query_name(node) -> str | None:
    for d in getattr(node, "decorator_list", []):
        if (isinstance(d, ast.Call) and isinstance(d.func, ast.Name)
                and d.func.id == "query" and d.args
                and isinstance(d.args[0], ast.Constant)):
            return d.args[0].value
    return None


def refs(node) -> set[str]:
    return {n.id for n in ast.walk(node) if isinstance(n, ast.Name)}


# --- classify every top-level node -----------------------------------------
header_end = None  # index of last header node
for i, node in enumerate(tree.body):
    if query_name(node):
        header_end = i - 1
        break
assert header_end is not None

kind: list[tuple[str, object]] = []  # (dest, payload) per node index
all_defs: dict[str, int] = {}  # top-level name -> node idx
for i, node in enumerate(tree.body):
    for nm in defined_names(node):
        all_defs[nm] = i

qname_of: dict[int, str] = {}
for i, node in enumerate(tree.body):
    if i <= header_end:
        kind.append(("core", None))
        continue
    qn = query_name(node)
    if qn:
        qname_of[i] = qn
        fam = FAMILY_OF_PREFIX.get(qn[0])
        assert fam, f"no family for query {qn}"
        kind.append(("family", fam))
        continue
    if isinstance(node, (ast.Import, ast.ImportFrom)):
        kind.append(("drop", None))  # covered by HDR_IMPORTS in every module
        continue
    dn = defined_names(node)
    if dn & SIG_NAMES:
        kind.append(("sig", None))
        continue
    if isinstance(node, (ast.For, ast.Expr)) and i > header_end:
        # the shard-registration loop / _reorder_registry() call / bare
        # string docs — route by reference to sig names
        if refs(node) & SIG_NAMES:
            kind.append(("sig", None))
            continue
    kind.append(("helper", None))

# --- helper routing: which families reference each helper ------------------
family_refs: dict[str, set[str]] = defaultdict(set)  # family -> names
sig_refs: set[str] = set()
for i, node in enumerate(tree.body):
    dest, payload = kind[i]
    if dest == "family":
        family_refs[payload] |= refs(node)
    elif dest == "sig":
        sig_refs |= refs(node)

helper_idx = [i for i, k in enumerate(kind) if k[0] == "helper"]
helper_names = {nm for i in helper_idx for nm in defined_names(tree.body[i])}

# transitive: helper -> helpers it references
helper_deps: dict[int, set[str]] = {
    i: refs(tree.body[i]) & helper_names for i in helper_idx
}

# iterate to fixpoint: users of a helper inherit its deps
home: dict[int, set[str]] = {}  # helper idx -> set of consumer families
for _ in range(20):
    changed = False
    for i in helper_idx:
        mine = set()
        dn = defined_names(tree.body[i])
        for fam, names in family_refs.items():
            if dn & names:
                mine.add(fam)
        if dn & sig_refs:
            mine.add("__sig__")
        # helpers referenced by other helpers inherit their homes
        for j in helper_idx:
            if j == i:
                continue
            if dn & helper_deps[j]:
                mine |= home.get(j, set())
        if home.get(i) != mine:
            home[i] = mine
            changed = True
    if not changed:
        break

helper_dest: dict[int, str] = {}
for i in helper_idx:
    homes = home[i]
    if not homes:
        helper_dest[i] = "registry"  # unused → keep in registry, visible
    elif homes == {"__sig__"}:
        helper_dest[i] = "registry"
    elif len(homes) == 1:
        helper_dest[i] = next(iter(homes))
    else:
        helper_dest[i] = "q_shared"

# cross-family references to QUERY functions (by python name)
qfn_names = {tree.body[i].name: kind[i][1] for i in qname_of
             if isinstance(tree.body[i], ast.FunctionDef)}
cross: dict[str, set[str]] = defaultdict(set)  # family -> names to import
for i, node in enumerate(tree.body):
    dest, payload = kind[i]
    if dest != "family":
        continue
    for r in refs(node) - defined_names(node):
        owner = qfn_names.get(r)
        if owner and owner != payload:
            cross[payload].add(r)
if any(cross.values()):
    print("CROSS-FAMILY query-fn refs:", dict(cross))

# --- report -----------------------------------------------------------------
sizes: dict[str, int] = defaultdict(int)
for i in range(len(tree.body)):
    dest, payload = kind[i]
    s, e = node_span(i)
    n = e - s + 1
    if dest == "family":
        sizes[payload] += n
    elif dest == "helper":
        sizes[helper_dest[i]] += n
    elif dest == "core":
        sizes["_core"] += n
    else:
        sizes["registry"] += n
for k, v in sorted(sizes.items()):
    print(f"{k:14s} {v:6d} lines")

if "--write" not in sys.argv:
    sys.exit(0)

# --- emit -------------------------------------------------------------------
HDR_IMPORTS = '''from __future__ import annotations

import math

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from openseizuredatabase_spark.operators import aggregates as agg_ops
from openseizuredatabase_spark.operators import dedup as dedup_ops
from openseizuredatabase_spark.operators import filters as filter_ops
from openseizuredatabase_spark.operators import joins as join_ops
from openseizuredatabase_spark.operators import splits as split_ops
from openseizuredatabase_spark.operators import windows as window_ops
from openseizuredatabase_spark.functions import text as text_fns
from openseizuredatabase_spark.functions.text import bpe_token_count_sql
from openseizuredatabase_spark.functions.hashing import (
    md5_long,
    md5_long_sql,
    seeded_md5_long,
    seeded_md5_long_sql,
)
from openseizuredatabase_spark.sources.lake import morton_sql
from openseizuredatabase_spark.sources import tables
from openseizuredatabase_spark.sources.tables import (
    load_table,
    spread_small_scan,
    table_meta,
)

from openseizuredatabase_spark.plans._core import (  # noqa: F401
    QUERIES,
    QuerySpec,
    query,
    _t,
    _ts,
)
'''

core_parts = [node_text(i) for i in range(header_end + 1)]
(PLANS / "_core.py").write_text("".join(core_parts))

shared_parts = []
family_parts: dict[str, list[str]] = {f: [] for f in FAMILIES}
registry_helper_parts: list[str] = []
sig_parts: list[str] = []
for i in range(header_end + 1, len(tree.body)):
    dest, payload = kind[i]
    txt = node_text(i)
    if dest == "family":
        family_parts[payload].append(txt)
    elif dest == "sig":
        sig_parts.append(txt)
    elif dest == "helper":
        d = helper_dest[i]
        if d == "q_shared":
            shared_parts.append(txt)
        elif d == "registry":
            registry_helper_parts.append(txt)
        else:
            family_parts[d].append(txt)

shared_names = sorted(
    nm for i in helper_idx if helper_dest[i] == "q_shared"
    for nm in defined_names(tree.body[i])
)
if shared_parts:
    (PLANS / "q_shared.py").write_text(
        '"""Helpers shared by more than one query-family module."""\n\n'
        + HDR_IMPORTS + "\n" + "".join(shared_parts)
    )

# decoration-time QUERIES["..."] lookups that cross family modules: the
# owning module must be imported (and thus registered) first.
FAMILY_PREIMPORT = {
    "q_relational": [
        ("q_window",
         '# q_window must register first: s15_streaming_detector\'s '
         'decorator\n# reuses QUERIES["w10_alarm_state_machine"].oracle '
         'at import time.\n'),
    ],
}

for fam in FAMILIES:
    imports = HDR_IMPORTS
    for mod, why in FAMILY_PREIMPORT.get(fam, ()):
        imports += (
            why + f"from openseizuredatabase_spark.plans import {mod} "
            f"as _{mod}  # noqa: F401\n"
        )
    need_shared = sorted(
        n for n in shared_names if any(n in refs(ast.parse(p))
                                       for p in family_parts[fam])
    ) if shared_parts else []
    if need_shared:
        imports += (
            "from openseizuredatabase_spark.plans.q_shared import (  "
            "# noqa: F401\n"
            + "".join(f"    {n},\n" for n in need_shared) + ")\n"
        )
    for name in sorted(cross.get(fam, ())):
        owner = qfn_names[name]
        imports += (f"from openseizuredatabase_spark.plans.{owner} "
                    f"import {name}  # noqa: F401\n")
    (PLANS / f"{fam}.py").write_text(
        f'"""{FAMILY_DOC[fam]}\n\nSplit out of plans/registry.py '
        '(round 6); statements moved verbatim.\n"""\n\n'
        + imports + "\n" + "".join(family_parts[fam])
    )

reg = (
    '"""Query registry: every operator from SURVEY.md §2 as a named query\n'
    "over the driver's synthetic lake, each with a DuckDB oracle SQL "
    "string.\n\nThe query definitions live in per-family modules "
    "(plans/q_relational.py,\nq_lake.py, q_window.py, q_ml.py, q_text.py, "
    "q_vector.py); importing them\nregisters each into the shared QUERIES "
    "dict (plans/_core.py).  This\nmodule keeps the driver-window signature "
    "shards and the explicit window\nordering, and re-exports every "
    "family-module name so legacy imports\n"
    "(`from ...plans.registry import <fn>`) keep working.\n"
    '"""\n\n'
    "from __future__ import annotations\n\n"
    "from pyspark.sql import DataFrame, SparkSession\n\n"
    "from openseizuredatabase_spark.plans._core import (  # noqa: F401\n"
    "    QUERIES,\n    QuerySpec,\n    query,\n    _t,\n    _ts,\n)\n"
    "from openseizuredatabase_spark.plans import (  # noqa: F401\n"
    + "".join(f"    {f},\n" for f in (["q_shared"] if shared_parts else []) + FAMILIES)
    + ")\n\n"
    "# Re-export every public and helper name from the family modules so\n"
    "# existing imports (tests, tools) resolve unchanged after the split.\n"
    "for _mod in (" + ", ".join((["q_shared"] if shared_parts else []) + FAMILIES) + "):\n"
    "    for _k, _v in vars(_mod).items():\n"
    "        if not _k.startswith('__') and _k not in globals():\n"
    "            globals()[_k] = _v\n"
    "del _mod, _k, _v\n\n"
    + "".join(registry_helper_parts)
    + "".join(sig_parts)
)
SRC.write_text(reg)
print("written")
