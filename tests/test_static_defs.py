"""Repo-wide undefined-name gate (tools/check_defs.py).

The round-10 snapshot shipped calls to a helper that was never defined —
a NameError invisible to import smoke checks because the call sites live
inside function bodies.  This test makes that class of regression fail
every pytest run, statically and in milliseconds, with no Spark session.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

from check_attrs import analyze  # noqa: E402
from check_defs import check_file, iter_py_files  # noqa: E402


def test_no_undefined_names():
    roots = [
        os.path.join(REPO, "cdc_platform_spark"),
        os.path.join(REPO, "tests"),
        os.path.join(REPO, "tools"),
        os.path.join(REPO, "__spark_entry__.py"),
        os.path.join(REPO, "bench.py"),
    ]
    findings = []
    for path in iter_py_files(roots):
        findings.extend(check_file(path))
    assert not findings, "\n".join(findings)


def test_no_unassigned_self_attributes():
    """Engine-source gate for the AttributeError class (the round-10
    self.path bug): a self.X read whose class hierarchy never assigns X.
    tests/ are excluded (fixtures monkeypatch attributes dynamically)."""
    roots = [
        os.path.join(REPO, "cdc_platform_spark"),
        os.path.join(REPO, "__spark_entry__.py"),
        os.path.join(REPO, "bench.py"),
    ]
    findings = analyze(iter_py_files(roots))
    assert not findings, "\n".join(findings)


def test_checker_catches_the_round10_bug_class(tmp_path):
    """Both round-10 failure shapes must be flagged: a call to a
    never-defined module-level helper, and a self-attribute read the
    class never assigns."""
    p = tmp_path / "broken.py"
    p.write_text("def outer(pool):\n    return _missing_helper(pool, 1)\n")
    findings = check_file(str(p))
    assert any("_missing_helper" in f for f in findings)

    q = tmp_path / "broken_attr.py"
    q.write_text(
        "class Sink:\n"
        "    def __init__(self, path):\n"
        "        self.inner = path\n"
        "    @property\n"
        "    def marker(self):\n"
        "        return f'{self.path}/_m'\n"
    )
    findings = analyze([str(q)])
    assert any("Sink.path" in f for f in findings)
