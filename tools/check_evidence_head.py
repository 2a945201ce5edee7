#!/usr/bin/env python
"""Round-close evidence gate (VERDICT r4 item 1): assert the COMMITTED
HARDWARE_EVIDENCE.json proves the tree being shipped.

Checks, mechanically:
  1. HARDWARE_EVIDENCE.json is committed (not dirty in the working tree);
  2. its ``ok`` flag is true;
  3. its recorded ``head`` is an ancestor of (or equal to) HEAD;
  4. every commit between that head and HEAD touches ONLY docs-grade
     paths (markdown, docs/, round artifacts) -- i.e. nothing the
     evidence measured has changed since it ran.

Exit 0 = the round may close on this evidence; exit 1 with a reason
otherwise. STATUS.md should quote this tool's output rather than
asserting "evidence green at HEAD" by hand (round 4 closed ~1 h before
its own evidence run finished; this makes that impossible to miss).
"""
from __future__ import annotations

import fnmatch
import json
import os
import subprocess
import sys

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))

#: Paths whose changes do NOT invalidate a hardware-evidence run: pure
#: documentation and round bookkeeping. Anything else (package code,
#: kernels, tests, bench.py, tools, native) re-opens the gate.
DOCS_ONLY_PATTERNS = (
    "*.md",
    "docs/*",
    "docs/**",
    "BENCH_r*.json",
    "MULTICHIP_r*.json",
    "COPYCHECK.json",
    "HARDWARE_EVIDENCE.json",  # committing the run's own artifact
    "PROGRESS.jsonl",
    "out/*",
    "out/**",
)


def is_docs_only(path: str) -> bool:
    return any(fnmatch.fnmatch(path, pat) for pat in DOCS_ONLY_PATTERNS)


def _git(*args: str) -> subprocess.CompletedProcess:
    return subprocess.run(["git", *args], cwd=ROOT, capture_output=True,
                          text=True)


def check(root: str = ROOT) -> tuple[bool, str]:
    """Pure-logic core (unit-tested host-side): returns (ok, reason)."""
    path = os.path.join(root, "HARDWARE_EVIDENCE.json")
    if not os.path.exists(path):
        return False, "HARDWARE_EVIDENCE.json missing"
    status = _git("status", "--porcelain", "--",
                  "HARDWARE_EVIDENCE.json").stdout.strip()
    if status:
        return False, ("HARDWARE_EVIDENCE.json is dirty in the working "
                       "tree -- commit the evidence run first")
    with open(path) as f:
        evidence = json.load(f)
    if not evidence.get("ok"):
        return False, f"committed evidence is not ok: " \
                      f"regressions={evidence.get('regressions')}"
    ev_head = evidence.get("head", "")
    if not ev_head:
        return False, "committed evidence records no head"
    if _git("cat-file", "-e", f"{ev_head}^{{commit}}").returncode != 0:
        return False, f"evidence head {ev_head[:12]} is not a commit here"
    if _git("merge-base", "--is-ancestor", ev_head,
            "HEAD").returncode != 0:
        return False, (f"evidence head {ev_head[:12]} is not an "
                       "ancestor of HEAD")
    changed = [p for p in _git("diff", "--name-only", f"{ev_head}..HEAD")
               .stdout.splitlines() if p.strip()]
    non_docs = [p for p in changed if not is_docs_only(p)]
    if non_docs:
        return False, ("evidence is stale: non-docs paths changed since "
                       f"its head {ev_head[:12]}: {non_docs[:10]}")
    n = len(changed)
    return True, (f"evidence head {ev_head[:12]} ok "
                  f"({n} docs-only path(s) since)" if n else
                  f"evidence head {ev_head[:12]} IS HEAD: ok")


def main() -> int:
    ok, reason = check()
    print(("PASS: " if ok else "FAIL: ") + reason)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
