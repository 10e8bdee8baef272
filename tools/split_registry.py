"""One-shot mechanical splitter for registry.py (VERDICT r5 #6).

Cuts the 22k-line registry into `registry_parts/partNN_<family>.py`
modules at top-level statement boundaries (preferring the `# ---`
section headers), generates explicit cross-part imports by AST name
analysis, and rewrites registry.py as a thin shim that imports the
parts in order (imports run the `@query` registrations, so QUERIES /
ORACLES / LAZY_ORACLES end up identical — same keys, same order).

Purely mechanical: no statement is edited, only moved. Run once from
the repo root; idempotence is NOT required (it refuses to run if
registry_parts/ already exists).
"""

from __future__ import annotations

import ast
import builtins
import re
import sys
from pathlib import Path

PKG = Path("rag_system_vector_db_spark")
SRC = PKG / "registry.py"
PARTS_DIR = PKG / "registry_parts"
TARGET_LINES = 3600  # split threshold; parts end up 2-4.5k lines

# names provided to every part by the generated header (must mirror
# HEADER below)
HEADER_NAMES = {
    "annotations", "_math", "_os", "Callable", "DataFrame",
    "SparkSession", "Window", "F", "H", "V", "chunking", "knn",
    "text_analysis", "STOPWORDS", "load_table",
    "QUERIES", "ORACLES", "LAZY_ORACLES", "query",
    "_dd_dot", "_dd_norm", "_dd_cosine", "_dd_euclid",
}

HEADER = '''\
"""{title} — mechanical split of registry.py (r6), statements unedited.

Registered into the shared QUERIES/ORACLES/LAZY_ORACLES dicts in
:mod:`..registry_core`; imported (in order) by :mod:`..registry`.
"""

from __future__ import annotations

import math as _math  # noqa: F401
import os as _os  # noqa: F401

from collections.abc import Callable  # noqa: F401

from pyspark.sql import DataFrame, SparkSession, Window  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401

from ..functions import hashing as H  # noqa: F401
from ..functions import vector as V  # noqa: F401
from ..operators import chunking, knn, text_analysis  # noqa: F401
from ..operators.text_analysis import STOPWORDS  # noqa: F401
from ..sources import load_table  # noqa: F401

from ..registry_core import (  # noqa: F401
    LAZY_ORACLES,
    ORACLES,
    QUERIES,
    _dd_cosine,
    _dd_dot,
    _dd_euclid,
    _dd_norm,
    query,
)
'''


def top_level_defs(stmts: list[ast.stmt]) -> set[str]:
    names: set[str] = set()
    for s in stmts:
        if isinstance(s, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            names.add(s.name)
        elif isinstance(s, ast.Assign):
            for t in s.targets:
                names.update(_target_names(t))
        elif isinstance(s, ast.AnnAssign) and isinstance(s.target, ast.Name):
            names.add(s.target.id)
        elif isinstance(s, (ast.For, ast.AsyncFor)):
            names.update(_target_names(s.target))
            names.update(top_level_defs(s.body))
            names.update(top_level_defs(s.orelse))
        elif isinstance(s, (ast.If, ast.Try, ast.With, ast.While)):
            for attr in ("body", "orelse", "finalbody", "handlers"):
                sub = getattr(s, attr, [])
                for x in sub:
                    if isinstance(x, ast.ExceptHandler):
                        names.update(top_level_defs(x.body))
                    elif isinstance(x, ast.stmt):
                        names.update(top_level_defs([x]))
        elif isinstance(s, (ast.Import, ast.ImportFrom)):
            for a in s.names:
                names.add((a.asname or a.name).split(".")[0])
    return names


def _target_names(t: ast.expr) -> set[str]:
    if isinstance(t, ast.Name):
        return {t.id}
    if isinstance(t, (ast.Tuple, ast.List)):
        out: set[str] = set()
        for e in t.elts:
            out.update(_target_names(e))
        return out
    return set()  # Subscript/Attribute targets define nothing


def used_names(stmts: list[ast.stmt]) -> set[str]:
    out: set[str] = set()
    for s in stmts:
        for node in ast.walk(s):
            if isinstance(node, ast.Name):
                out.add(node.id)
    return out


def main() -> None:
    if PARTS_DIR.exists():
        sys.exit(f"{PARTS_DIR} already exists — refusing to re-split")
    src_text = SRC.read_text()
    src_lines = src_text.splitlines(keepends=True)
    tree = ast.parse(src_text)
    stmts = list(tree.body)

    # ---- header/core: everything before the first @query'd function
    first_q = next(
        i
        for i, s in enumerate(stmts)
        if isinstance(s, ast.FunctionDef)
        and any(
            isinstance(d, ast.Call)
            and isinstance(d.func, ast.Name)
            and d.func.id == "query"
            for d in s.decorator_list
        )
    )
    core_stmts, body_stmts = stmts[:first_q], stmts[first_q:]

    def stmt_start(s: ast.stmt) -> int:
        if getattr(s, "decorator_list", None):
            return s.decorator_list[0].lineno
        return s.lineno

    core_end = core_stmts[-1].end_lineno  # type: ignore[union-attr]

    # ---- section headers -> preferred cut lines
    section_re = re.compile(r"^# -{20,}$")
    section_lines: list[tuple[int, str]] = []
    for i, ln in enumerate(src_lines, 1):
        if section_re.match(ln.rstrip("\n")) and i + 1 <= len(src_lines):
            title = src_lines[i].lstrip("# ").strip()
            section_lines.append((i, title))

    # ---- partition body stmts into parts
    parts: list[dict] = []
    cur: list[ast.stmt] = []
    cur_title = "Vector store / RAG core"
    cur_start_line = stmt_start(body_stmts[0])

    def flush(next_start: int | None) -> None:
        nonlocal cur, cur_title, cur_start_line
        if cur:
            parts.append(
                {
                    "title": cur_title,
                    "stmts": cur,
                    "start": cur_start_line,
                    "end": cur[-1].end_lineno,
                }
            )
        cur = []
        if next_start is not None:
            cur_start_line = next_start

    sec_iter = [(ln, t) for ln, t in section_lines if ln > core_end]
    for s in body_stmts:
        start = stmt_start(s)
        # does a section header fall between previous stmt and this one?
        crossed = [t for ln, t in sec_iter if cur and cur[-1].end_lineno < ln <= start]
        size = (cur[-1].end_lineno - cur_start_line) if cur else 0
        if crossed and size > TARGET_LINES * 0.55:
            flush(start)
            cur_title = crossed[-1]
        elif size > TARGET_LINES:
            flush(start)
            cur_title = cur_title + " (cont.)"
        cur.append(s)
    flush(None)

    # ---- write core module
    core_src = "".join(src_lines[: core_end])
    core_src = core_src.replace(
        '"""Query registry: every SURVEY §2 operator as (Spark callable, DuckDB oracle).',
        '"""Shared registration state for the split registry '
        "(mechanical r6 split).\n\n"
        "Every SURVEY §2 operator as (Spark callable, DuckDB oracle).",
        1,
    )
    # fix relative imports depth: core sits at package top level, same as
    # registry.py did — no change needed.
    (PKG / "registry_core.py").write_text(core_src)

    # ---- write parts with cross-part imports
    PARTS_DIR.mkdir()
    all_defs: list[tuple[str, set[str]]] = []  # (module_name, defs)
    init_lines = [
        '"""Split registry parts — imported in order by ..registry."""\n',
    ]
    core_defs = top_level_defs(core_stmts)
    for idx, part in enumerate(parts, 1):
        title = part["title"]
        slug = re.sub(r"[^a-z0-9]+", "_", title.lower()).strip("_")
        slug = "_".join(slug.split("_")[:4])[:40] or "misc"
        mod = f"part{idx:02d}_{slug}"
        defs = top_level_defs(part["stmts"])
        used = used_names(part["stmts"])
        needed = used - defs - HEADER_NAMES - set(dir(builtins)) - core_defs
        imports: dict[str, list[str]] = {}
        for n in sorted(needed):
            for prev_mod, prev_defs in reversed(all_defs):
                if n in prev_defs:
                    imports.setdefault(prev_mod, []).append(n)
                    break
        body = "".join(src_lines[part["start"] - 1 : part["end"]])
        # parts sit one level deeper than registry.py did — deepen the
        # relative imports inside moved function bodies
        body = re.sub(r"\bfrom \.(?=[a-z])", "from ..", body)
        body = re.sub(r"\bfrom \. import\b", "from .. import", body)
        imp_block = ""
        for prev_mod in sorted(imports):
            names = ", ".join(sorted(imports[prev_mod]))
            imp_block += f"from .{prev_mod} import {names}  # noqa: F401\n"
        text = HEADER.format(title=title)
        if imp_block:
            text += "\n" + imp_block
        text += "\n\n" + body
        (PARTS_DIR / f"{mod}.py").write_text(text)
        all_defs.append((mod, defs))
        init_lines.append(f"from . import {mod}  # noqa: F401,E402\n")
        print(f"{mod}: lines {part['start']}-{part['end']} "
              f"({part['end'] - part['start'] + 1}), {len(defs)} defs, "
              f"x-imports {sum(len(v) for v in imports.values())}")
    (PARTS_DIR / "__init__.py").write_text("".join(init_lines))

    # ---- shim registry.py
    shim = '''\
"""Query registry: every SURVEY §2 operator as (Spark callable, DuckDB oracle).

``QUERIES[name](spark, sf_dir) -> DataFrame`` and ``ORACLES[name]`` is
ANSI SQL DuckDB runs on the same parquet views. Column names/aliases
match exactly; float columns are rounded to 6 decimals on both sides
AFTER any ordering/ranking on full precision, so value-hashes agree.

r6: mechanically split by SURVEY §2 family into
``registry_parts/partNN_*`` (statements unedited — see
tools/split_registry.py); importing this module imports every part in
the original order, so registration order and the driver's 50-entry
window are byte-identical to the monolith.
"""

from __future__ import annotations

from .registry_core import (  # noqa: F401
    LAZY_ORACLES,
    ORACLES,
    QUERIES,
    query,
)
from . import registry_parts  # noqa: F401  (imports run registrations)
'''
    SRC.write_text(shim)
    print(f"core: 1-{core_end}; {len(parts)} parts; shim written")


if __name__ == "__main__":
    main()
