#!/usr/bin/env python
"""Splice tools/window_plan.py output into queries/__init__.py (_PRIORITY block)."""
import re
import subprocess
import sys
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TARGET = os.path.join(REPO, "pyresample_spark", "queries", "__init__.py")

through = sys.argv[1] if len(sys.argv) > 1 else "14"
out = subprocess.run(
    [sys.executable, os.path.join(REPO, "tools", "window_plan.py"), "--through", through],
    capture_output=True, text=True, check=True,
).stdout

src = open(TARGET).read()
# Replace from the "# WINDOW (generated" comment through the closing "]" of _PRIORITY.
pat = re.compile(r"# WINDOW \(generated.*?_PRIORITY = \[.*?\n\]\n", re.S)
assert pat.search(src), "WINDOW block not found"
new = pat.sub(out.rstrip("\n") + "\n", src, count=1)
open(TARGET, "w").write(new)
print("spliced", len(out.splitlines()), "lines into", TARGET)
