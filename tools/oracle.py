#!/usr/bin/env python3
"""Golden-file generator driven by the reference rayforce binary.

Usage: python tools/oracle.py CASES.json [-o GOLDEN.json]

CASES.json: {"name": ["stmt1", ..., "final_expr"], ...} — each case runs its
statements in order in a fresh engine; the final expression's value is
captured as `format`-ed text (obj_fmt with quoted mode, reference
tests/main.c TEST_ASSERT_EQ discipline). If evaluation errors, the golden is
"ERROR:<kind>".

The reference binary is built out-of-tree (e.g. /tmp/refbuild/rayforce); it
is only used to RECORD goldens. Tests compare against the committed JSON and
never need the binary.
"""
from __future__ import annotations

import json
import re
import subprocess
import sys
import tempfile
import os

ORACLE_BIN = os.environ.get("RAYFORCE_ORACLE", "/tmp/refbuild/rayforce")
SENTINEL = "@@CASE-BOUNDARY@@"

ANSI_RE = re.compile(r"\x1b\[[0-9;]*m")


def unescape(s: str) -> str:
    """Invert the reference's bare-mode c8 escaping (format.c c8_fmt_into)."""
    out = []
    i = 0
    while i < len(s):
        c = s[i]
        if c == "\\" and i + 1 < len(s):
            n = s[i + 1]
            if n == "n":
                out.append("\n"); i += 2; continue
            if n == "r":
                out.append("\r"); i += 2; continue
            if n == "t":
                out.append("\t"); i += 2; continue
            if n == '"':
                out.append('"'); i += 2; continue
            if n == "\\":
                out.append("\\"); i += 2; continue
            if n.isdigit() and i + 3 < len(s):
                out.append(chr(int(s[i + 1:i + 4], 8))); i += 4; continue
        out.append(c)
        i += 1
    return "".join(out)


def run_case(stmts: list[str]) -> str:
    """Run one case in a fresh engine, return the golden text."""
    lines = []
    for st in stmts[:-1]:
        lines.append(st)
    final = stmts[-1]
    lines.append(
        '(show (try (format {expr}) (fn [__e] '
        '(concat "RAYERR>" __e))))'.format(expr=final))
    src = "\n".join(lines) + "\n"
    with tempfile.NamedTemporaryFile("w", suffix=".rfl", delete=False) as f:
        f.write(src)
        path = f.name
    try:
        p = subprocess.run([ORACLE_BIN, "-f", path], capture_output=True,
                           timeout=120)
        out = p.stdout.decode("utf-8", errors="replace")
        if out.endswith("\n"):
            out = out[:-1]
        if out.startswith('"') and out.endswith('"') and len(out) >= 2:
            out = out[1:-1]
        if p.returncode != 0:
            txt = ANSI_RE.sub("", out + p.stderr.decode("utf-8",
                                                        errors="replace"))
            m = re.search(r"Error:\s*(\w+)", txt)
            return "ERROR:" + (m.group(1) if m else "crash")
        if "RAYERR>" in out:
            # (format err) yields just the kind name, e.g. "type"
            txt = unescape(out.split("RAYERR>", 1)[1]).strip()
            return "ERROR:" + txt
        return unescape(out)
    finally:
        os.unlink(path)


def main():
    cases_path = sys.argv[1]
    out_path = sys.argv[2] if len(sys.argv) > 2 else None
    with open(cases_path) as f:
        cases = json.load(f)
    golden = {}
    for name, stmts in cases.items():
        if isinstance(stmts, str):
            stmts = [stmts]
        golden[name] = {"stmts": stmts, "expect": run_case(stmts)}
        print(f"{name}: {golden[name]['expect'][:70]!r}")
    if out_path:
        with open(out_path, "w") as f:
            json.dump(golden, f, indent=1, ensure_ascii=False)
        print(f"wrote {out_path} ({len(golden)} cases)")


if __name__ == "__main__":
    main()
