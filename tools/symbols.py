"""Function-level (symbol-level) dependency closures for the rotation
planner — r10 verdict item #3.

The module-granular import graph in :mod:`tools.selfcheck` is the right
tool for SPLICE admissibility (conservative: over-re-verify, never
under), but it over-produces *staleness*: a 5-line append to ``text.py``
marks every text query's old driver row code-stale, so each growth round
regrows a ~100-row rotation backlog that a 50-slot grading window can
never clear. This module diffs at the granularity a row actually
depends on — the top-level ``def``/``class``/assignment *symbols* a
query transitively references — so appending a new operator stales
nothing but itself.

Design:

- Every package file is parsed (``ast``) into top-level **symbols**:
  functions, classes, and assignments (one symbol per bound name),
  hashed over their normalized source (``ast.unparse`` — comment/
  whitespace edits don't count as changes). Module-level import
  statements become per-name **binding symbols** (``import:<name>``)
  hashed over their resolved target, so *adding* an import stales
  nothing while *retargeting* one stales exactly its users. Whatever
  top-level statements remain (try/except guards, conditional blocks)
  pool into one ``<module>`` symbol; names BOUND inside them are
  tracked so their users edge to ``<module>`` (r11 advisory — else a
  ``try: X=… except: X=…`` constant's edits would stale nothing).
- The registration dict gets special treatment: ``QUERIES = {...}``
  decomposes into one ``QUERIES[<name>]`` symbol per entry (hash of
  that entry's value expression), because the dict literal as a whole
  changes on every registration — exactly the append-stales-everything
  failure this module exists to fix.
- **Edges** go from each symbol to every top-level symbol / import
  binding it references by name (plus ``module.attr`` attribute access
  through module bindings). Unresolvable module-object uses degrade to
  a per-file wildcard ``(file, "*")`` — conservative. Registration
  hubs (``registry.py``/``rotation.py``/``queries/__init__.py``) are
  name-wiring and excluded exactly as in the module-level graph; a hub
  change forces a full sweep by the standing rule, not rotation.
- A query's **closure** is the BFS over this graph from its
  ``QUERIES[<name>]`` entry symbol; a round's row is code-stale iff
  the closure intersects the set of symbols whose hash differs between
  that round's marker tree and the reference tree.

Shadowing caveat (deliberate, conservative): name references are
collected from a symbol's whole body without local-scope analysis, so a
local variable that happens to share a module symbol's name creates a
false edge — extra staleness, never missed staleness.

All inputs are plain ``{relpath: source}`` dicts, so the analysis is
pure and testable without git; :mod:`tfm_taxitrips_spark.queries.rotation`
supplies tree contents from the round-marker commits.
"""

from __future__ import annotations

import ast
import hashlib
import os

#: (file, symbol-name); symbol-name "*" means "any symbol in file"
SymbolId = tuple[str, str]

MODULE_SYM = "<module>"

#: registration hubs — name-wiring, excluded from the symbol graph for
#: the same reason tools.selfcheck._import_graph drops their edges
HUB_FILES = (
    os.path.join("tfm_taxitrips_spark", "queries", "registry.py"),
    os.path.join("tfm_taxitrips_spark", "queries", "rotation.py"),
    os.path.join("tfm_taxitrips_spark", "queries", "__init__.py"),
)


def _sha(text: str) -> str:
    return hashlib.sha256(text.encode()).hexdigest()


def _bound_names(node: ast.stmt) -> list[str]:
    """Top-level names an Assign/AnnAssign binds."""
    targets = (
        node.targets if isinstance(node, ast.Assign) else [node.target]
    )
    out: list[str] = []
    for t in targets:
        if isinstance(t, ast.Name):
            out.append(t.id)
        elif isinstance(t, (ast.Tuple, ast.List)):
            out.extend(e.id for e in t.elts if isinstance(e, ast.Name))
    return out


class ModuleIndex:
    """Per-file symbol table: hashes, import aliases, reference sets."""

    def __init__(self, relpath: str, src: str) -> None:
        self.relpath = relpath
        self.symbols: dict[str, str] = {}          # name -> source hash
        self.refs: dict[str, set[str]] = {}        # name -> referenced ids
        self.attr_refs: dict[str, set[tuple[str, str]]] = {}  # (obj, attr)
        # local name -> (module dotted path, attr-or-None)
        self.aliases: dict[str, tuple[str, str | None]] = {}

        tree = ast.parse(src)
        pkg_of_file = relpath[:-3].replace(os.sep, ".").rpartition(".")[0]

        # --- aliases: every import anywhere in the file (function-local
        # imports resolve edges too; their TEXT is already inside the
        # enclosing symbol's hash)
        module_level_imports: list[ast.stmt] = []
        for node in ast.walk(tree):
            if isinstance(node, ast.Import):
                for a in node.names:
                    self.aliases[a.asname or a.name.split(".")[0]] = (
                        a.name, None)
            elif isinstance(node, ast.ImportFrom):
                base = node.module or ""
                if node.level:
                    parts = pkg_of_file.split(".")
                    parts = parts[: len(parts) - (node.level - 1)]
                    base = ".".join(parts + ([base] if base else []))
                for a in node.names:
                    self.aliases[a.asname or a.name] = (base, a.name)

        # --- top-level symbols
        self.leftover_names: set[str] = set()
        leftover: list[ast.stmt] = []
        for node in tree.body:
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef,
                                 ast.ClassDef)):
                self._add(node.name, node)
            elif isinstance(node, (ast.Assign, ast.AnnAssign)):
                names = _bound_names(node)
                if (
                    names == ["QUERIES"]
                    and node.value is not None
                    and isinstance(node.value, ast.Dict)
                    and all(isinstance(k, ast.Constant)
                            for k in node.value.keys)
                ):
                    for k, v in zip(node.value.keys, node.value.values):
                        self._add(f"QUERIES[{k.value}]", v)
                    continue
                if node.value is None:      # bare annotation: no content
                    continue
                for n in names or [MODULE_SYM]:
                    self._add(n, node)
            elif isinstance(node, (ast.Import, ast.ImportFrom)):
                module_level_imports.append(node)
            elif (isinstance(node, ast.Expr)
                  and isinstance(node.value, ast.Constant)
                  and isinstance(node.value.value, str)):
                continue                     # module docstring: no deps
            else:
                leftover.append(node)

        # --- per-name binding symbols for module-level imports:
        # hash = resolved target, so adding a NEW import changes nothing
        # existing, while retargeting an import stales exactly its users
        for node in module_level_imports:
            if isinstance(node, ast.Import):
                for a in node.names:
                    self.symbols[f"import:{a.asname or a.name.split('.')[0]}"
                                 ] = _sha(a.name)
            else:
                base = node.module or ""
                if node.level:
                    parts = pkg_of_file.split(".")
                    parts = parts[: len(parts) - (node.level - 1)]
                    base = ".".join(parts + ([base] if base else []))
                for a in node.names:
                    self.symbols[f"import:{a.asname or a.name}"] = _sha(
                        f"{base}.{a.name}")

        if leftover:
            self._add(MODULE_SYM, leftover)
            # names BOUND inside leftover statements (try/if/for blocks:
            # assignments, defs, imports, with/for targets). Referencing
            # symbols get an edge to MODULE_SYM for these (r11 advisory:
            # without it, a 'try: X=... except: X=...' constant's users
            # would be silently missed — the one hole in the module's
            # 'extra staleness, never missed' guarantee).
            for node in leftover:
                for sub in ast.walk(node):
                    if isinstance(sub, ast.Name) and isinstance(
                            sub.ctx, ast.Store):
                        self.leftover_names.add(sub.id)
                    elif isinstance(sub, (ast.FunctionDef,
                                          ast.AsyncFunctionDef,
                                          ast.ClassDef)):
                        self.leftover_names.add(sub.name)
                    elif isinstance(sub, ast.Import):
                        for a in sub.names:
                            self.leftover_names.add(
                                a.asname or a.name.split(".")[0])
                    elif isinstance(sub, ast.ImportFrom):
                        for a in sub.names:
                            self.leftover_names.add(a.asname or a.name)

    def _add(self, name: str, node) -> None:
        nodes = node if isinstance(node, list) else [node]
        text = "\n".join(ast.unparse(n) for n in nodes)
        if name in self.symbols:  # e.g. conditional re-def: pool the text
            text = self.symbols[name] + "\n" + text
        self.symbols[name] = _sha(text)
        names: set[str] = set()
        attrs: set[tuple[str, str]] = set()
        for n in nodes:
            for sub in ast.walk(n):
                if isinstance(sub, ast.Attribute) and isinstance(
                        sub.value, ast.Name):
                    attrs.add((sub.value.id, sub.attr))
                elif isinstance(sub, ast.Name):
                    names.add(sub.id)
        self.refs[name] = self.refs.get(name, set()) | names
        self.attr_refs[name] = self.attr_refs.get(name, set()) | attrs


def index_files(files: dict[str, str]) -> dict[str, ModuleIndex]:
    """Parse every non-hub package file into a :class:`ModuleIndex`."""
    return {
        p: ModuleIndex(p, src)
        for p, src in files.items()
        if p.endswith(".py") and p not in HUB_FILES
    }


def symbol_table(relpath: str, src: str) -> dict[str, str] | None:
    """``{symbol name: hash}`` for one file, or ``None`` when the file
    doesn't parse (callers degrade it to the per-file wildcard). The
    memoizable unit for the rotation planner's per-(path, blob) cache
    (r11 advisory: re-parsing every marker tree per round was the
    planner's quadratic-ish cost)."""
    try:
        return ModuleIndex(relpath, src).symbols
    except SyntaxError:
        return None


def changed_symbols_from_tables(
    old_tables: dict[str, dict[str, str] | None],
    new_tables: dict[str, dict[str, str] | None],
) -> set[SymbolId]:
    """Diff two precomputed symbol-table maps (``{path: table-or-None}``;
    an absent path means the file doesn't exist on that side, ``None``
    means it exists but doesn't parse → per-file wildcard)."""
    out: set[SymbolId] = set()
    for p in set(old_tables) | set(new_tables):
        old = old_tables.get(p)
        new = new_tables.get(p)
        if (p in old_tables and old is None) or (
                p in new_tables and new is None):
            out.add((p, "*"))
            continue
        old = old or {}
        new = new or {}
        for s in set(old) | set(new):
            if old.get(s) != new.get(s):
                out.add((p, s))
    return out


def changed_symbols(
    old_files: dict[str, str], new_files: dict[str, str]
) -> set[SymbolId]:
    """Symbols whose normalized source differs between two trees (added,
    removed, or edited). A file unparseable on either side degrades to
    the per-file wildcard — conservative."""
    def tables(files: dict[str, str]) -> dict[str, dict[str, str] | None]:
        return {p: symbol_table(p, src) for p, src in files.items()
                if p.endswith(".py") and p not in HUB_FILES}

    return changed_symbols_from_tables(tables(old_files), tables(new_files))


def _module_to_path(files: dict[str, str]) -> dict[str, str]:
    out = {}
    for p in files:
        if not p.endswith(".py"):
            continue
        mod = p[:-3].replace(os.sep, ".")
        if mod.endswith(".__init__"):
            mod = mod[: -len(".__init__")]
        out[mod] = p
    return out


def symbol_graph(
    indexes: dict[str, ModuleIndex]
) -> dict[SymbolId, set[SymbolId]]:
    """Edges from each symbol to the symbols it references, same-file
    and cross-file (through import bindings)."""
    mod_to_path = _module_to_path({p: "" for p in indexes})
    graph: dict[SymbolId, set[SymbolId]] = {}

    def resolve_module(dotted: str) -> str | None:
        while dotted:
            if dotted in mod_to_path:
                return mod_to_path[dotted]
            dotted = dotted.rpartition(".")[0]
        return None

    def target_of(idx: ModuleIndex, local: str,
                  attr: str | None) -> set[SymbolId]:
        """Edges for a use of import binding ``local`` (optionally
        ``local.attr``)."""
        mod, name = idx.aliases[local]
        edges: set[SymbolId] = set()
        bind = f"import:{local}"
        if bind in idx.symbols:
            edges.add((idx.relpath, bind))
        if name is not None:
            # ``from mod import name`` — maybe a symbol, maybe a module
            tfile = resolve_module(f"{mod}.{name}")
            if tfile and tfile == mod_to_path.get(f"{mod}.{name}"):
                # bound a MODULE object
                if attr is None:
                    edges.add((tfile, "*"))
                else:
                    syms = indexes[tfile].symbols
                    edges.add((tfile, attr if attr in syms else "*"))
                return edges
            tfile = resolve_module(mod)
            if tfile is None:
                return edges                      # external package
            syms = indexes[tfile].symbols
            edges.add((tfile, name if name in syms else "*"))
            return edges
        # ``import mod`` — a module object
        tfile = resolve_module(mod)
        if tfile is None:
            return edges
        if attr is None:
            edges.add((tfile, "*"))
        else:
            syms = indexes[tfile].symbols
            edges.add((tfile, attr if attr in syms else "*"))
        return edges

    for p, idx in indexes.items():
        for s in idx.symbols:
            if s.startswith("import:"):
                graph[(p, s)] = set()
                continue
            deps: set[SymbolId] = set()
            for n in idx.refs.get(s, ()):
                if n in idx.symbols and n != s:
                    deps.add((p, n))
                elif n in idx.aliases:
                    deps |= target_of(idx, n, None)
                # leftover-bound names additionally pull in MODULE_SYM
                # (not exclusive with the branches above: a conditional
                # re-binding of a top-level symbol lives in BOTH)
                if n in idx.leftover_names:
                    deps.add((p, MODULE_SYM))
            for obj, attr in idx.attr_refs.get(s, ()):
                if obj in idx.aliases and obj not in idx.symbols:
                    deps |= target_of(idx, obj, attr)
            deps.discard((p, s))
            graph[(p, s)] = deps
    return graph


def closure(
    graph: dict[SymbolId, set[SymbolId]], roots: set[SymbolId]
) -> set[SymbolId]:
    seen = set(roots)
    stack = list(roots)
    while stack:
        for d in graph.get(stack.pop(), ()):
            if d not in seen:
                seen.add(d)
                stack.append(d)
    return seen


def intersects(closure_syms: set[SymbolId],
               changed: set[SymbolId]) -> bool:
    """Closure ∩ changed, honoring per-file wildcards on EITHER side."""
    if closure_syms & changed:
        return True
    closure_wild = {f for f, s in closure_syms if s == "*"}
    changed_wild = {f for f, s in changed if s == "*"}
    if closure_wild and any(f in closure_wild for f, _ in changed):
        return True
    if changed_wild and any(f in changed_wild for f, _ in closure_syms):
        return True
    return False


def query_roots(files: dict[str, str],
                query_modules: dict[str, str]) -> dict[str, set[SymbolId]]:
    """query name -> root symbols: its ``QUERIES[<name>]`` entry symbol
    (falls back to the per-file wildcard if the entry shape is ever not
    a constant-keyed dict literal)."""
    indexes = index_files(files)
    out: dict[str, set[SymbolId]] = {}
    for name, relpath in query_modules.items():
        idx = indexes.get(relpath)
        entry = f"QUERIES[{name}]"
        if idx is not None and entry in idx.symbols:
            out[name] = {(relpath, entry)}
        else:
            out[name] = {(relpath, "*")}
    return out


def query_symbol_closures(
    files: dict[str, str], query_modules: dict[str, str]
) -> dict[str, set[SymbolId]]:
    """query name -> transitive symbol closure (the planner's unit of
    staleness). ``query_modules`` maps each registered query to the
    repo-relative file its ``QUERIES`` entry lives in."""
    indexes = index_files(files)
    graph = symbol_graph(indexes)
    roots = query_roots(files, query_modules)
    memo: dict[frozenset, set[SymbolId]] = {}
    out = {}
    for name, r in roots.items():
        key = frozenset(r)
        if key not in memo:
            memo[key] = closure(graph, set(r))
        out[name] = memo[key]
    return out
