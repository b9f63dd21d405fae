"""One-shot mechanical splitter for pipelines/queries.py (round 5).

Splits the 12k-line module into per-family modules with a re-exporting
facade, ZERO behavior change: top-level statements are assigned to modules
by line range, cross-module name references become explicit imports
(resolved by AST — no duplicate top-level names exist, verified), and the
facade re-imports every top-level name so ``pipelines.queries.<anything>``
keeps working for tests/scripts/the driver.
"""

from __future__ import annotations

import ast
import builtins
import collections
from pathlib import Path

SRC = Path("medical_ocr_service_ray/pipelines/queries.py")
PKG = Path("medical_ocr_service_ray/pipelines")

# (module_name, first_line) — statements from first_line up to the next
# module's first_line belong to the module. The prelude (before FIRST) goes
# to _qcommon; the registry tail (from TAIL) stays in the facade.
FAMILIES = [
    ("queries_core", "q1 core aggregates, dedup, extraction flagship, sketches (q1-q34)", 109),
    ("queries_text", "sampling, text stats, BM25/TF-IDF, k-means, pivots (q35-q60)", 2079),
    ("queries_joins", "range/band joins, decontamination, HLL, graph, ANN (q61-q86)", 3540),
    ("queries_analytics", "windows, churn, CDC/SCD, triangles, z-order, profiling (q87-q112)", 5203),
    ("queries_attribution", "attribution, funnels, distribution stats, checksums (q113-q131)", 7178),
    ("queries_mlprep", "cohorts, drift, BPE, ANN eval, entity resolution (q132-q150)", 8467),
    ("queries_advanced", "curriculum, semantic dedup, graph mesh, itemsets, LSH eval (q151-q169)", 10007),
]
TAIL_LINE = 11818  # "# ---- registry" divider

HEADER = '''"""{doc} — split from pipelines/queries.py (r5), no behavior change."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from pathlib import Path
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data as rd

from medical_ocr_service_ray.config import set_engine_shuffle_profile
from medical_ocr_service_ray.functions.textstats import (
    LANGS,
    STOPWORDS,
    sql_lang_score,
    sql_occurrences,
)
from medical_ocr_service_ray.stages import text as text_stages
from medical_ocr_service_ray.stages.aggregate import (
    bucketed_combine,
    driver_combine,
    partial_then_combine,
)
from medical_ocr_service_ray.stages.dedup import exact_dedup, minhash_lsh_pairs, simhash_pairs
from medical_ocr_service_ray.stages.join import BroadcastMapper, SemiAntiFilter
'''


def top_level_names(stmts) -> list[str]:
    out = []
    for st in stmts:
        if isinstance(st, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            out.append(st.name)
        elif isinstance(st, ast.Assign):
            out.extend(t.id for t in st.targets if isinstance(t, ast.Name))
        elif isinstance(st, ast.AnnAssign) and isinstance(st.target, ast.Name):
            out.append(st.target.id)
        elif isinstance(st, (ast.Import, ast.ImportFrom)):
            for a in st.names:
                out.append((a.asname or a.name).split(".")[0])
    return out


def referenced_names(stmts) -> set[str]:
    refs = set()
    for st in stmts:
        for node in ast.walk(st):
            if isinstance(node, ast.Name):
                refs.add(node.id)
    return refs


def main() -> None:
    src = SRC.read_text()
    lines = src.splitlines(keepends=True)
    tree = ast.parse(src)

    bounds = [(name, lo) for name, _desc, lo in FAMILIES]
    descs = {name: d for name, d, _ in FAMILIES}

    def module_of(lineno: int) -> str:
        if lineno < bounds[0][1]:
            return "_qcommon"
        if lineno >= TAIL_LINE:
            return "__tail__"
        for (name, lo), (_n2, hi) in zip(bounds, bounds[1:] + [("x", TAIL_LINE)]):
            if lo <= lineno < hi:
                return name
        raise AssertionError(lineno)

    mod_stmts = collections.defaultdict(list)
    for st in tree.body:
        mod_stmts[module_of(st.lineno)].append(st)

    mod_defs = {m: top_level_names(sts) for m, sts in mod_stmts.items()}
    owner = {}
    for m, names in mod_defs.items():
        for n in names:
            owner.setdefault(n, m)

    order = ["_qcommon"] + [n for n, _ in bounds]
    builtin_names = set(dir(builtins))

    # line spans per module: stmt body INCLUDING preceding comment/blank gap
    spans = collections.defaultdict(list)
    prev_end = 0
    for st in tree.body:
        m = module_of(st.lineno)
        spans[m].append((prev_end + 1, st.end_lineno))
        prev_end = st.end_lineno

    emitted = []
    for m in order:
        own = set(mod_defs.get(m, []))
        refs = referenced_names(mod_stmts.get(m, []))
        needed = collections.defaultdict(list)
        fwd = []
        for r in sorted(refs):
            if r in own or r in builtin_names:
                continue
            o = owner.get(r)
            if o and o != m:
                if order.index(o) < order.index(m) or o == "_qcommon":
                    needed[o].append(r)
                else:
                    fwd.append((r, o))
        if fwd:
            print(f"FORWARD REFS in {m}: {fwd} — manual handling required")
        body = "".join(
            "".join(lines[a - 1 : b]) for a, b in spans[m]
        )
        if m == "_qcommon":
            text = body  # prelude already carries docstring + imports
        else:
            imports = ""
            for o in order:
                if o in needed:
                    names = ", ".join(sorted(set(needed[o])))
                    stmt = f"from medical_ocr_service_ray.pipelines.{o} import {names}\n"
                    if len(stmt) > 88:
                        stmt = (
                            f"from medical_ocr_service_ray.pipelines.{o} import (\n    "
                            + ",\n    ".join(sorted(set(needed[o])))
                            + ",\n)\n"
                        )
                    imports += stmt
            text = HEADER.format(doc=descs[m]) + imports + "\n\n" + body
        (PKG / f"{m}.py").write_text(text)
        emitted.append(m)
        print(f"wrote {m}.py: {len(text.splitlines())} lines, imports from {sorted(needed)}")

    # facade: docstring/prelude-free — re-import EVERY top-level name, then
    # the registry tail verbatim
    tail = "".join(lines[TAIL_LINE - 1 :])
    fac = '"""Facade: the full query surface, split into per-family modules (r5).\n\nEvery top-level name from the original 12k-line module is re-exported so\n`pipelines.queries.<name>` (tests, scripts, the driver) is unchanged.\nFamilies: ' + ", ".join(
        n for n, _, _ in FAMILIES
    ) + '.\n"""\n\nfrom __future__ import annotations\n\n'
    for m in order:
        names = sorted(set(mod_defs.get(m, [])))
        if not names:
            continue
        fac += (
            f"from medical_ocr_service_ray.pipelines.{m} import (  # noqa: F401\n    "
            + ",\n    ".join(names)
            + ",\n)\n"
        )
    fac += "\n" + tail
    SRC.write_text(fac)
    print(f"facade queries.py: {len(fac.splitlines())} lines")


if __name__ == "__main__":
    main()
