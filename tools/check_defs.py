"""Static undefined-name checker: the NameError class of regression.

Round 10 shipped a refactor that extracted two inline blocks into a call
to a helper that was never written — a NameError on every affected code
path, invisible to import-time smoke checks (the call sites live inside
function bodies) and caught only by running the code.  This tool catches
it statically: Python's own ``symtable`` computes real scoping, and any
symbol a scope resolves as GLOBAL_IMPLICIT that is neither defined at
module level nor a builtin is a name the module cannot supply — a
guaranteed NameError if the line executes.

Usage:
    python tools/check_defs.py [paths...]   # default: the whole repo
Exit 0 = clean, 1 = findings (one ``file:scope: name`` line each).

Enforced on every pytest run by tests/test_static_defs.py.
"""

from __future__ import annotations

import builtins
import os
import sys
import symtable

# Names resolvable at runtime without a module-level binding.
_ALLOWED = set(dir(builtins)) | {
    "__file__",
    "__name__",
    "__doc__",
    "__package__",
    "__spec__",
    "__loader__",
    "__builtins__",
    "__debug__",
    # class-body implicit names
    "__qualname__",
    "__module__",
    "__class__",
}


def _module_defs(table: symtable.SymbolTable) -> set[str]:
    return {
        s.get_name()
        for s in table.get_symbols()
        if s.is_assigned() or s.is_imported() or s.is_parameter()
    }


def _walk(table: symtable.SymbolTable, module_defs: set[str], path: str, findings: list[str]) -> None:
    for child in table.get_children():
        for sym in child.get_symbols():
            name = sym.get_name()
            if not sym.is_referenced() or sym.is_declared_global():
                continue
            # a symbol the scope neither binds locally nor finds in an
            # enclosing function scope resolves GLOBAL_IMPLICIT: it must
            # exist at module level or in builtins.  (A parameter captured
            # by a nested comprehension reports is_global AND is_local —
            # bound names are never findings.)
            bound = (
                sym.is_local()
                or sym.is_parameter()
                or sym.is_assigned()
                or sym.is_imported()
                or sym.is_free()
            )
            if sym.is_global() and not bound and name not in module_defs and name not in _ALLOWED:
                findings.append(f"{path}:{child.get_name()}: undefined name '{name}'")
        _walk(child, module_defs, path, findings)


def check_file(path: str) -> list[str]:
    with open(path, encoding="utf-8") as fh:
        src = fh.read()
    try:
        table = symtable.symtable(src, path, "exec")
    except SyntaxError as exc:
        return [f"{path}: syntax error: {exc}"]
    findings: list[str] = []
    module_defs = _module_defs(table)
    # module-level references are import-time NameErrors — the smoke
    # entry catches those, but report them here too for one-stop output
    for sym in table.get_symbols():
        name = sym.get_name()
        if (
            sym.is_referenced()
            and not (sym.is_assigned() or sym.is_imported())
            and name not in _ALLOWED
        ):
            findings.append(f"{path}:<module>: undefined name '{name}'")
    _walk(table, module_defs, path, findings)
    return findings


def iter_py_files(roots: list[str]) -> list[str]:
    out = []
    for root in roots:
        if os.path.isfile(root):
            out.append(root)
            continue
        for dirpath, dirnames, filenames in os.walk(root):
            dirnames[:] = [d for d in dirnames if d != "__pycache__"]
            out.extend(
                os.path.join(dirpath, f) for f in filenames if f.endswith(".py")
            )
    return sorted(out)


def main(argv: list[str]) -> int:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    roots = argv or [
        os.path.join(repo, "cdc_platform_spark"),
        os.path.join(repo, "tests"),
        os.path.join(repo, "tools"),
        os.path.join(repo, "__spark_entry__.py"),
        os.path.join(repo, "bench.py"),
    ]
    findings: list[str] = []
    files = iter_py_files(roots)
    for path in files:
        findings.extend(check_file(path))
    for line in findings:
        print(line)
    print(f"{len(files)} files checked, {len(findings)} undefined names", file=sys.stderr)
    return 1 if findings else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
