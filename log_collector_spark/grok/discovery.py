"""Grok discovery (P9) — propose a grok expression from a sample line.

Re-expression of the reference's ``Discovery.discover``
(grok/api/Discovery.java:97-172, complexity sort :51-89): compile every
dictionary pattern standalone, walk them from most to least complex
(complexity = '|'-count + expanded length, :80-89), and greedily substitute
the first matched region of the text with ``%{NAME}`` — skipping trivial
patterns (complexity < 20), parts without an inner word boundary, and parts
that already contain a substitution. Pure driver-side Python (dev tool, not
a pipeline stage).
"""

from __future__ import annotations

import re

from log_collector_spark.grok.compiler import GrokCompiler


def _complexity(expanded: str) -> int:
    return (expanded.count("|")) + len(expanded)


_BOUNDARY = re.compile(r".\b.")
_ALREADY = re.compile(r"%\{[^}+]\}")


def discover(line: str, compiler: GrokCompiler | None = None) -> str:
    """Return the proposed grok expression for ``line``."""
    if not line:
        return ""
    compiler = compiler or GrokCompiler()
    compiled = []
    for name in compiler.patterns:
        try:
            cg = compiler.compile("%{" + name + "}")
        except Exception:
            continue
        compiled.append((name, cg))
    # most complex first (reference sorts descending by complexity)
    compiled.sort(key=lambda nc: -_complexity(nc[1].python_regex))

    text = line
    for name, cg in compiled:
        if _complexity(cg.python_regex) < 20:
            continue
        m = re.compile(cg.python_regex).search(line)
        if m is None or not m.group(0):
            continue
        part = m.group(0)
        if not _BOUNDARY.search(part):
            continue
        if _ALREADY.search(part):
            continue
        text = text.replace(part, "%{" + name + "}")
    return text
