"""Static unassigned-self-attribute checker: the AttributeError class.

The round-10 snapshot added properties reading ``self.path`` to a sink
whose ``__init__`` never assigned it — an AttributeError on every write
and recovery, invisible at import time.  This tool flags ``self.X``
READS in a class none of whose methods (nor any repo-resolvable base
class) ever BINDS ``X`` via ``self.X = ...``, a class-level assignment,
or a method/property definition.

Heuristic by nature (dynamic attributes defeat any static check), so it
errs quiet rather than noisy:
- a class whose hierarchy leaves the repo (unresolvable base) is skipped;
- a class that defines ``__getattr__``/``__init_subclass__`` or calls
  ``setattr`` is skipped;
- a class whose ``self`` escapes bare (passed to a helper that may
  assign onto it) is skipped;
- staticmethods have no self; nested classes are scanned as their own
  scope, never attributed to the enclosing class.

Usage:
    python tools/check_attrs.py [paths...]   # default: cdc_platform_spark + entry + bench
Exit 0 = clean, 1 = findings.
"""

from __future__ import annotations

import ast
import os
import sys


class _ClassInfo:
    def __init__(self, name: str, module: str, bases: list[str]):
        self.name = name
        self.module = module
        self.bases = bases  # textual base names ("Foo", "mod.Foo")
        self.assigned: set[str] = set()  # self.X = / cls-level / defs
        self.read: dict[str, int] = {}  # attr -> first lineno
        self.dynamic = False  # setattr / __getattr__ / self-escape seen


def _decorator_names(fn) -> set[str]:
    out = set()
    for d in fn.decorator_list:
        if isinstance(d, ast.Name):
            out.add(d.id)
        elif isinstance(d, ast.Attribute):
            out.add(d.attr)
        elif isinstance(d, ast.Call):
            f = d.func
            out.add(f.id if isinstance(f, ast.Name) else getattr(f, "attr", "?"))
    return out


def _scan_method(node: ast.AST, selfname: str, info: _ClassInfo) -> None:
    """Record self.X stores/loads within a method body, pruning nested
    classes (their own scope) and nested functions that rebind selfname."""
    for child in ast.iter_child_nodes(node):
        if isinstance(child, ast.ClassDef):
            continue  # separate scope, analyzed as its own class
        if isinstance(child, (ast.FunctionDef, ast.AsyncFunctionDef, ast.Lambda)):
            a = child.args
            params = {p.arg for p in a.posonlyargs + a.args + a.kwonlyargs}
            if a.vararg:
                params.add(a.vararg.arg)
            if a.kwarg:
                params.add(a.kwarg.arg)
            if selfname in params:
                continue  # rebound: inner self is not ours
            _scan_method(child, selfname, info)
            continue
        if (
            isinstance(child, ast.Attribute)
            and isinstance(child.value, ast.Name)
            and child.value.id == selfname
        ):
            if isinstance(child.ctx, (ast.Store, ast.Del)):
                info.assigned.add(child.attr)
            else:
                info.read.setdefault(child.attr, child.lineno)
            continue  # the Name below is the receiver, already handled
        if isinstance(child, ast.Call):
            f = child.func
            if isinstance(f, ast.Name) and f.id in ("setattr", "delattr", "vars"):
                info.dynamic = True
        if isinstance(child, ast.Name) and child.id == selfname:
            # bare `self` (not as an attribute receiver): escapes — a
            # callee or container may assign attributes we cannot see
            info.dynamic = True
        _scan_method(child, selfname, info)


def _collect_class(node: ast.ClassDef, module: str) -> _ClassInfo:
    bases = []
    for b in node.bases:
        if isinstance(b, ast.Name):
            bases.append(b.id)
        elif isinstance(b, ast.Attribute):
            bases.append(ast.unparse(b))
        else:
            bases.append("?")
    info = _ClassInfo(node.name, module, bases)

    for item in node.body:
        if isinstance(item, (ast.FunctionDef, ast.AsyncFunctionDef)):
            info.assigned.add(item.name)
            if item.name in ("__getattr__", "__getattribute__", "__init_subclass__", "__setattr__"):
                info.dynamic = True
            decs = _decorator_names(item)
            if "staticmethod" in decs:
                continue  # no self
            args = item.args.posonlyargs + item.args.args
            if not args:
                continue
            _scan_method(item, args[0].arg, info)
        elif isinstance(item, ast.Assign):
            for t in item.targets:
                if isinstance(t, ast.Name):
                    info.assigned.add(t.id)
        elif isinstance(item, ast.AnnAssign) and isinstance(item.target, ast.Name):
            info.assigned.add(item.target.id)
    return info


_OBJECT_ATTRS = set(dir(object)) | {"__dict__", "__weakref__", "__slots__"}
_EXTERNAL_OK = {"object", "Exception", "BaseException", "RuntimeError", "ValueError", "TypeError", "KeyError", "OSError"}


def analyze(paths: list[str]) -> list[str]:
    classes: dict[str, _ClassInfo] = {}
    order: list[_ClassInfo] = []
    for path in paths:
        try:
            tree = ast.parse(open(path, encoding="utf-8").read(), filename=path)
        except SyntaxError as exc:
            return [f"{path}: syntax error: {exc}"]
        for node in ast.walk(tree):
            if isinstance(node, ast.ClassDef):
                info = _collect_class(node, path)
                classes[node.name] = info  # last-wins on collision: fine for a report
                order.append(info)

    def resolved_assigned(info: _ClassInfo, seen: set[str]) -> set[str] | None:
        """Union of assigned attrs over the repo-resolvable hierarchy, or
        None (skip) if any base leaves the repo or a class is dynamic."""
        if info.dynamic:
            return None
        out = set(info.assigned)
        for base in info.bases:
            name = base.split(".")[-1]
            if name in _EXTERNAL_OK or name in seen:
                continue
            parent = classes.get(name)
            if parent is None:
                return None
            sub = resolved_assigned(parent, seen | {name})
            if sub is None:
                return None
            out |= sub
        return out

    findings = []
    for info in order:
        assigned = resolved_assigned(info, {info.name})
        if assigned is None:
            continue
        for attr, lineno in sorted(info.read.items(), key=lambda kv: kv[1]):
            if attr not in assigned and attr not in _OBJECT_ATTRS:
                findings.append(
                    f"{info.module}:{lineno}: {info.name}.{attr} read but never assigned in hierarchy"
                )
    return findings


def iter_py_files(roots: list[str]) -> list[str]:
    out = []
    for root in roots:
        if os.path.isfile(root):
            out.append(root)
            continue
        for dirpath, dirnames, filenames in os.walk(root):
            dirnames[:] = [d for d in dirnames if d != "__pycache__"]
            out.extend(os.path.join(dirpath, f) for f in filenames if f.endswith(".py"))
    return sorted(out)


def main(argv: list[str]) -> int:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    roots = argv or [
        os.path.join(repo, "cdc_platform_spark"),
        os.path.join(repo, "__spark_entry__.py"),
        os.path.join(repo, "bench.py"),
    ]
    findings = analyze(iter_py_files(roots))
    for line in findings:
        print(line)
    print(f"{len(findings)} unassigned self-attribute reads", file=sys.stderr)
    return 1 if findings else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
