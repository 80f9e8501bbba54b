#!/usr/bin/env python
"""Minimal F821-style static checker (stdlib-only; no ruff/pyflakes in env).

Flags names that are *used* somewhere in a module but bound nowhere in any
enclosing scope, module globals, builtins, or imports — exactly the class of
bug that shipped in round 2 (`VMEM_LIMIT_MB` referenced in a function but
never defined; NameError only at runtime, so the suite had to execute the
line to see it).

Uses the stdlib `symtable` module: a symbol that a function scope marks
GLOBAL_IMPLICIT must be bound at module level (or be a builtin / a name the
module star-imports). Wildcard imports and `globals()[...]=` tricks make this
conservative: modules containing `import *` or exec are skipped for the
global check.

Usage: python scripts/check_undefined.py PATH [PATH...]
Exit code 1 if any undefined name is found.
"""
from __future__ import annotations

import ast
import builtins
import sys
import symtable
from pathlib import Path

BUILTINS = set(dir(builtins)) | {"__file__", "__name__", "__doc__",
                                 "__package__", "__spec__", "__loader__",
                                 "__builtins__", "__debug__", "__path__",
                                 "__annotations__", "__dict__", "__class__"}


def module_bindings(tree: ast.Module) -> tuple[set, bool]:
    """All names bound at module level (assign/def/class/import), plus a
    flag for whether a wildcard import / exec makes the set unknowable."""
    bound, unknowable = set(), False
    for node in ast.walk(tree):
        if isinstance(node, (ast.Import, ast.ImportFrom)):
            for alias in node.names:
                if alias.name == "*":
                    unknowable = True
                else:
                    bound.add((alias.asname or alias.name).split(".")[0])
        elif isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef,
                               ast.ClassDef)):
            bound.add(node.name)
        elif isinstance(node, ast.Name) and isinstance(node.ctx, ast.Store):
            bound.add(node.id)
        elif isinstance(node, ast.Call) and isinstance(node.func, ast.Name) \
                and node.func.id == "exec":
            unknowable = True
        elif isinstance(node, ast.Global):
            bound.update(node.names)
    return bound, unknowable


def check_file(path: Path) -> list[str]:
    src = path.read_text()
    try:
        tree = ast.parse(src, str(path))
        table = symtable.symtable(src, str(path), "exec")
    except SyntaxError as e:
        return [f"{path}:{e.lineno}: syntax error: {e.msg}"]
    bound, unknowable = module_bindings(tree)
    if unknowable:
        return []
    # Line numbers for reporting: first load-use of each name.
    first_use: dict[str, int] = {}
    for node in ast.walk(tree):
        if isinstance(node, ast.Name) and isinstance(node.ctx, ast.Load):
            first_use.setdefault(node.id, node.lineno)

    problems = []

    def visit(tb: symtable.SymbolTable):
        for sym in tb.get_symbols():
            name = sym.get_name()
            # A referenced (not assigned) symbol resolved to module scope.
            if (sym.is_referenced() and not sym.is_assigned()
                    and sym.is_global() and not sym.is_imported()
                    and name not in bound and name not in BUILTINS):
                line = first_use.get(name, 0)
                problems.append(
                    f"{path}:{line}: undefined name '{name}' "
                    f"(used in scope '{tb.get_name()}')")
        for child in tb.get_children():
            visit(child)

    visit(table)
    return problems


def main(argv: list[str]) -> int:
    roots = [Path(a) for a in (argv or ["dycoreplanet_tpu"])]
    files: list[Path] = []
    for r in roots:
        files.extend(sorted(r.rglob("*.py")) if r.is_dir() else [r])
    all_problems = []
    for f in files:
        if "native/build" in str(f):
            continue
        all_problems.extend(check_file(f))
    for p in all_problems:
        print(p)
    print(f"check_undefined: {len(files)} files, {len(all_problems)} problems")
    return 1 if all_problems else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
